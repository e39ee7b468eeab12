"""Machine-checked Hive-2.3.10 function-catalog parity audit (SURVEY.md §2.8).

``HIVE_FUNCTION_NAMES`` is the complete 287-name builtin registry of Hive
2.3.10, extracted from the string-constant pool of the registry class's
static initializer::

    unzip hive-exec-2.3.10-core.jar \
        org/apache/hadoop/hive/ql/exec/FunctionRegistry.class
    javap -c -p FunctionRegistry.class          # `// String <name>` constants
    # take the `static {};` block's constants, lowercase, dedup -> 287 names

(upstream source: ql/src/java/org/apache/hadoop/hive/ql/exec/
FunctionRegistry.java — every ``system.register*("name", ...)`` call site).
The constant-pool route is used because the class's *runtime* static init
needs LLAP classes absent from the -core jar; the extracted set matches the
287-name live ``getFunctionNames()`` dump recorded in SURVEY.md §0.3.

Every name is classified into exactly one disposition bucket below, and
tests/test_function_parity.py enforces (a) the buckets partition the 287
names with no overlap and no leftovers, (b) every NATIVE name really exists
in this Spark build's ``SHOW FUNCTIONS``, (c) every SHIM name maps to a
callable in functions/hive_compat.py, (d) every other bucket entry carries
its documented equivalent/reason. That turns SURVEY §2.8's coverage claim
from prose into a test.
"""

from __future__ import annotations

HIVE_FUNCTION_NAMES: tuple[str, ...] = (
    '!', '!=', '$sum0', '%', '&', '*', '+', '-', '/', '<', '<=', '<=>', '<>',
    '=', '==', '>', '>=', '^', 'abs', 'acos', 'add_months', 'aes_decrypt',
    'aes_encrypt', 'and', 'array', 'array_contains', 'ascii', 'asin',
    'assert_true', 'atan', 'avg', 'base64', 'between', 'bigint', 'bin',
    'binary', 'bloom_filter', 'boolean', 'bround', 'cardinality_violation',
    'case', 'cbrt', 'ceil', 'ceiling', 'char', 'char_length',
    'character_length', 'chr', 'coalesce', 'collect_list', 'collect_set',
    'compute_stats', 'concat', 'concat_ws', 'context_ngrams', 'conv', 'corr',
    'cos', 'count', 'covar_pop', 'covar_samp', 'crc32', 'create_union',
    'cume_dist', 'current_database', 'current_date', 'current_timestamp',
    'current_user', 'date', 'date_add', 'date_format', 'date_sub', 'datediff',
    'day', 'dayofmonth', 'dayofweek', 'decimal', 'decode', 'degrees',
    'dense_rank', 'div', 'double', 'e', 'elt', 'encode', 'ewah_bitmap',
    'ewah_bitmap_and', 'ewah_bitmap_empty', 'ewah_bitmap_or', 'exp', 'explode',
    'extract_union', 'factorial', 'field', 'find_in_set', 'first_value',
    'float', 'floor', 'floor_day', 'floor_hour', 'floor_minute', 'floor_month',
    'floor_quarter', 'floor_second', 'floor_week', 'floor_year',
    'format_number', 'from_unixtime', 'from_utc_timestamp', 'get_json_object',
    'get_splits', 'greatest', 'grouping', 'hash', 'hex', 'histogram_numeric',
    'hour', 'if', 'in', 'in_bloom_filter', 'in_file', 'index', 'initcap',
    'inline', 'instr', 'int', 'internal_interval', 'interval_day_time',
    'interval_year_month', 'isnotnull', 'isnull', 'java_method', 'json_tuple',
    'lag', 'last_day', 'last_value', 'lcase', 'lead', 'least', 'length',
    'levenshtein', 'like', 'ln', 'locate', 'log', 'log10', 'log2',
    'logged_in_user', 'lower', 'lpad', 'ltrim', 'map', 'map_keys', 'map_values',
    'mask', 'mask_first_n', 'mask_hash', 'mask_last_n', 'mask_show_first_n',
    'mask_show_last_n', 'matchpath', 'max', 'md5', 'min', 'minute', 'mod',
    'month', 'months_between', 'named_struct', 'negative', 'next_day', 'ngrams',
    'noop', 'noopstreaming', 'noopwithmap', 'noopwithmapstreaming', 'not',
    'ntile', 'nullif', 'nvl', 'octet_length', 'or', 'parse_url',
    'parse_url_tuple', 'percent_rank', 'percentile', 'percentile_approx', 'pi',
    'pmod', 'posexplode', 'positive', 'pow', 'power', 'printf', 'quarter',
    'radians', 'rand', 'rank', 'reflect', 'reflect2', 'regexp',
    'regexp_extract', 'regexp_replace', 'regr_avgx', 'regr_avgy', 'regr_count',
    'regr_intercept', 'regr_r2', 'regr_slope', 'regr_sxx', 'regr_sxy',
    'regr_syy', 'repeat', 'replace', 'replicate_rows', 'reverse', 'rlike',
    'round', 'row_number', 'rpad', 'rtrim', 'second', 'sentences', 'sha',
    'sha1', 'sha2', 'shiftleft', 'shiftright', 'shiftrightunsigned', 'sign',
    'sin', 'size', 'smallint', 'sort_array', 'sort_array_by', 'soundex',
    'space', 'split', 'sq_count_check', 'sqrt', 'stack', 'std', 'stddev',
    'stddev_pop', 'stddev_samp', 'str_to_map', 'string', 'struct', 'substr',
    'substring', 'substring_index', 'sum', 'tan', 'timestamp', 'tinyint',
    'to_date', 'to_unix_timestamp', 'to_utc_timestamp', 'translate', 'trim',
    'trunc', 'ucase', 'unbase64', 'unhex', 'unix_timestamp', 'upper', 'uuid',
    'var_pop', 'var_samp', 'varchar', 'variance', 'version', 'weekofyear',
    'when', 'windowingtablefunction', 'xpath', 'xpath_boolean', 'xpath_double',
    'xpath_float', 'xpath_int', 'xpath_long', 'xpath_number', 'xpath_short',
    'xpath_string', 'year', '|', '~',
)

# Hive name -> attribute in hive_apache_ci_spark.functions.hive_compat.
SHIMMED: dict[str, str] = {
    'field': 'field',
    'in_file': 'in_file',
    'logged_in_user': 'logged_in_user',
    'reflect2': 'reflect2',
    'floor_second': 'floor_second',
    'floor_minute': 'floor_minute',
    'floor_hour': 'floor_hour',
    'floor_day': 'floor_day',
    'floor_week': 'floor_week',
    'floor_month': 'floor_month',
    'floor_quarter': 'floor_quarter',
    'floor_year': 'floor_year',
    'mask_first_n': 'mask_first_n',
    'mask_last_n': 'mask_last_n',
    'mask_show_first_n': 'mask_show_first_n',
    'mask_show_last_n': 'mask_show_last_n',
    'mask_hash': 'mask_hash',
    'parse_url_tuple': 'parse_url_tuple',
    'replicate_rows': 'replicate_rows',
    'sort_array_by': 'sort_array_by',
    'ngrams': 'ngrams',
    'context_ngrams': 'context_ngrams',
    'matchpath': 'matchpath',
}

# Hive name -> Spark equivalent expressed differently (API call / syntax),
# with the surface that exercises it.
EQUIVALENT: dict[str, str] = {
    'index': "a[i] bracket op -> element_at()/getItem() (expr_collection_hof)",
    'varchar': "cast syntax col.cast('varchar(n)') (expr_cast_permissive)",
    'interval_year_month': "INTERVAL literal / make_ym_interval",
    'interval_day_time': "INTERVAL literal / make_dt_interval",
    'create_union': "tagged-struct emulation (uniontype_tagged query)",
    'extract_union': "tagged-struct emulation (uniontype_tagged query)",
}

# Engine-internal plumbing with no user-facing semantics: the concern is
# owned by Catalyst/AQE in Spark (reason strings say by what).
INTERNAL: dict[str, str] = {
    '$sum0': "internal zero-default SUM used by windowing rewrite; Spark's sum handles it",
    'bloom_filter': "runtime semijoin filter build; Spark injects BloomFilterAggregate (test_bloom_filter_semijoin_injects)",
    'in_bloom_filter': "runtime semijoin probe; Spark BloomFilterMightContain (same test)",
    'cardinality_violation': "MERGE duplicate-match guard; our merge_into_upsert asserts uniqueness in the plan itself",
    'compute_stats': "ANALYZE TABLE internals; Spark ANALYZE covers (analyze_column_stats query)",
    'sq_count_check': "scalar-subquery runtime guard; Catalyst decorrelation owns it (subquery_scalar)",
    'get_splits': "LLAP split generation; no user semantics",
    'internal_interval': "parser-internal interval constructor",
    'noop': "PTF test scaffolding",
    'noopwithmap': "PTF test scaffolding",
    'noopstreaming': "PTF test scaffolding",
    'noopwithmapstreaming': "PTF test scaffolding",
    'windowingtablefunction': "the PTF window evaluator itself; Spark WindowExec owns it",
}

# Features removed upstream (Hive 3 dropped bitmap indexes) — documented
# scope-outs, SURVEY.md §7.8.
REMOVED: dict[str, str] = {
    'ewah_bitmap': "bitmap-index aggregate; indexes removed in Hive 3",
    'ewah_bitmap_and': "bitmap-index op; removed in Hive 3",
    'ewah_bitmap_or': "bitmap-index op; removed in Hive 3",
    'ewah_bitmap_empty': "bitmap-index op; removed in Hive 3",
}

#: Names expected verbatim in Spark's SHOW FUNCTIONS (computed, not listed).
NATIVE: tuple[str, ...] = tuple(
    n
    for n in HIVE_FUNCTION_NAMES
    if n not in SHIMMED
    and n not in EQUIVALENT
    and n not in INTERNAL
    and n not in REMOVED
)
