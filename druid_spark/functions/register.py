"""Register Druid's SQL function surface as Spark SQL-defined UDFs.

Reference: sql/calcite/planner/DruidOperatorTable.java (operator
registrations, lines 190-423). SQL UDFs (CREATE TEMPORARY FUNCTION ...
RETURN expr) are inlined by Catalyst — zero runtime overhead, full
codegen, no Python in the data path.

Names that collide with Spark builtins of identical semantics (ABS,
CONCAT, LOWER, ROUND, ARRAY_CONTAINS, ...) need nothing. Collisions
with *different* semantics (REGEXP_EXTRACT's default group, Druid
ARRAY_PREPEND's (value, arr) arg order) cannot be shadowed — the text
rewriter in sqlshim.py handles those.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# months-since-epoch floored to multiples of n, rebuilt as a timestamp —
# the calendar floor PeriodGranularity applies for P<n>M with the
# default (epoch) origin; {k} is the month count expression
_MONTH_FLOOR = """
  make_timestamp(
    1970 + cast(floor(floor(((year(ts) - 1970) * 12 + month(ts) - 1)
                            / ({k})) * ({k}) / 12) AS INT),
    cast(floor(((year(ts) - 1970) * 12 + month(ts) - 1) / ({k})) * ({k})
         - 12 * floor(floor(((year(ts) - 1970) * 12 + month(ts) - 1)
                            / ({k})) * ({k}) / 12) AS INT) + 1,
    1, 0, 0, 0)
"""
_N_MONTHS = "cast(regexp_extract(p, 'P([0-9]+)M', 1) AS BIGINT)"
_N_YEARS = "cast(regexp_extract(p, 'P([0-9]+)Y', 1) AS BIGINT)"

# JSONPath normalization shared by the JSON_* SQL UDFs: the path must
# start with '$' (getJsonPathPartsFromLiteral — the reference's error
# text is pinned by CalciteNestedDataQueryTest testGroupByInvalidPath)
# and a trailing negative array index [-n] (NestedPathFinder supports
# negative indexes — testJsonPathNegativeIndex) is rewritten to the
# length-relative positive index at runtime. Out-of-range stays
# negative and extracts NULL.
_JNP = """CASE
        WHEN p = '$.' THEN '$'
        WHEN p NOT LIKE '$%' THEN raise_error(concat(
          'JSONPath [', p, '] is invalid, it must start with ''$'''))
        WHEN p RLIKE '\\\\[-[0-9]+\\\\]' THEN concat(
          regexp_extract(p, '^(.*?)\\\\[-[0-9]+\\\\]', 1), '[',
          cast(json_array_length(get_json_object(j,
                 regexp_extract(p, '^(.*?)\\\\[-[0-9]+\\\\]', 1)))
               + cast(regexp_extract(p, '^.*?\\\\[(-[0-9]+)\\\\]', 1)
                      AS INT) AS STRING), ']',
          regexp_extract(p, '^.*?\\\\[-[0-9]+\\\\](.*)$', 1))
        ELSE p END"""
_JGET = f"get_json_object(j, {_JNP})"


def _jquote(x: str) -> str:
    """JSON-quote a string scalar for NESTED_DATA rendering (backslash
    and quote escaped; control chars not re-escaped — documented edge
    of the text-extraction path)."""
    return ("concat('\"', replace(replace(" + x +
            ", '\\\\', '\\\\\\\\'), '\"', '\\\\\"'), '\"')")

# period → (date_trunc unit); generic P<n>M / P<n>Y floor on the
# calendar (variable-length months); fixed-width fallback for PT<n>X /
# P<n>D / P<n>W; unknown periods yield NULL (never a silent 1-day bucket)
_TRUNC_CASE = f"""
  CASE
    WHEN p = 'PT1S' THEN date_trunc('second', ts)
    WHEN p = 'PT1M' THEN date_trunc('minute', ts)
    WHEN p = 'PT1H' THEN date_trunc('hour', ts)
    WHEN p = 'P1D' THEN date_trunc('day', ts)
    WHEN p = 'P1W' THEN date_trunc('week', ts)
    WHEN p = 'P1M' THEN date_trunc('month', ts)
    WHEN p = 'P3M' THEN date_trunc('quarter', ts)
    WHEN p = 'P1Y' THEN date_trunc('year', ts)
    WHEN p RLIKE '^P[0-9]+M$' THEN {_MONTH_FLOOR.format(k=_N_MONTHS)}
    WHEN p RLIKE '^P[0-9]+Y$' THEN make_timestamp(
      1970 + cast(floor((year(ts) - 1970) / ({_N_YEARS})) * ({_N_YEARS})
                  AS INT), 1, 1, 0, 0, 0)
    ELSE timestamp_millis(cast(floor(unix_millis(ts) / {{dur}}) * {{dur}} AS BIGINT))
  END
"""

_DUR_MS = """
  CASE
    WHEN p RLIKE '^PT[0-9]+S$' THEN cast(regexp_extract(p, 'PT([0-9]+)S', 1) AS BIGINT) * 1000
    WHEN p RLIKE '^PT[0-9]+[.][0-9]+S$' THEN
      cast(cast(regexp_extract(p, 'PT([0-9.]+)S', 1) AS DECIMAL(20,6))
           * 1000 AS BIGINT)
    WHEN p RLIKE '^PT[0-9]+M$' THEN cast(regexp_extract(p, 'PT([0-9]+)M', 1) AS BIGINT) * 60000
    WHEN p RLIKE '^PT[0-9]+H$' THEN cast(regexp_extract(p, 'PT([0-9]+)H', 1) AS BIGINT) * 3600000
    WHEN p RLIKE '^P[0-9]+D$' THEN cast(regexp_extract(p, 'P([0-9]+)D', 1) AS BIGINT) * 86400000
    WHEN p RLIKE '^P[0-9]+W$' THEN cast(regexp_extract(p, 'P([0-9]+)W', 1) AS BIGINT) * 604800000
    ELSE cast(NULL AS BIGINT)
  END
"""

_TIME_FLOOR_BODY = _TRUNC_CASE.format(dur=f"({_DUR_MS})")

_FUNCS: list[tuple[str, str, str, str]] = [
    # (name, args, return type, body)
    ("TIME_FLOOR", "ts TIMESTAMP, p STRING", "TIMESTAMP", _TIME_FLOOR_BODY),
    # ceil: aligned → ts; calendar periods advance by the period (a
    # fixed-width add would be wrong for variable-length months/years);
    # fixed-width periods add their duration to the floor
    ("TIME_CEIL", "ts TIMESTAMP, p STRING", "TIMESTAMP",
     f"""CASE WHEN ({_TIME_FLOOR_BODY}) = ts THEN ts
       WHEN p = 'P1W' THEN date_trunc('week', ts) + INTERVAL 1 WEEK
       WHEN p = 'P1M' THEN date_trunc('month', ts) + INTERVAL 1 MONTH
       WHEN p = 'P3M' THEN date_trunc('quarter', ts) + INTERVAL 3 MONTH
       WHEN p = 'P1Y' THEN date_trunc('year', ts) + INTERVAL 1 YEAR
       WHEN p RLIKE '^P[0-9]+M$' THEN ({_TIME_FLOOR_BODY})
         + make_interval(0, cast({_N_MONTHS} AS INT), 0, 0, 0, 0, 0)
       WHEN p RLIKE '^P[0-9]+Y$' THEN ({_TIME_FLOOR_BODY})
         + make_interval(cast({_N_YEARS} AS INT), 0, 0, 0, 0, 0, 0)
       ELSE timestamp_millis(unix_millis({_TIME_FLOOR_BODY}) + ({_DUR_MS}))
     END"""),
    # calendar periods shift by calendar units (P1M ≠ fixed millis —
    # TimestampShiftExprMacro uses joda Period.plus); fixed-width
    # periods shift by n*duration; unknown periods yield NULL
    ("TIME_SHIFT", "ts TIMESTAMP, p STRING, n INT", "TIMESTAMP", f"""
     CASE
       WHEN p RLIKE '^P[0-9]+M$' THEN ts
         + make_interval(0, cast(n * {_N_MONTHS} AS INT), 0, 0, 0, 0, 0)
       WHEN p RLIKE '^P[0-9]+Y$' THEN ts
         + make_interval(cast(n * {_N_YEARS} AS INT), 0, 0, 0, 0, 0, 0)
       ELSE timestamp_millis(unix_millis(ts) + n * ({_DUR_MS}))
     END"""),
    ("TIME_EXTRACT", "ts TIMESTAMP, unit STRING", "BIGINT", """
      CASE upper(unit)
        WHEN 'EPOCH' THEN unix_timestamp(ts)
        WHEN 'MILLISECOND' THEN unix_millis(ts) % 1000
        WHEN 'SECOND' THEN second(ts) WHEN 'MINUTE' THEN minute(ts)
        WHEN 'HOUR' THEN hour(ts) WHEN 'DAY' THEN day(ts)
        WHEN 'DOW' THEN (dayofweek(ts) + 5) % 7 + 1
        WHEN 'ISODOW' THEN (dayofweek(ts) + 5) % 7 + 1
        WHEN 'DOY' THEN dayofyear(ts)
        WHEN 'WEEK' THEN weekofyear(ts) WHEN 'MONTH' THEN month(ts)
        WHEN 'QUARTER' THEN quarter(ts) WHEN 'YEAR' THEN year(ts)
        WHEN 'ISOYEAR' THEN extract(YEAROFWEEK FROM ts)
        WHEN 'DECADE' THEN floor(year(ts) / 10)
        WHEN 'CENTURY' THEN ceil(year(ts) / 100)
        WHEN 'MILLENNIUM' THEN ceil(year(ts) / 1000)
      END"""),
    ("TIME_FORMAT", "ts TIMESTAMP, pat STRING", "STRING",
     "date_format(ts, pat)"),
    # bare 1-4 digit strings are partial-ISO years (Joda
    # ISODateTimeFormat.dateTimeParser: time_parse('1') = year 1 —
    # qaUnnest mv scalar_datetime goldens); Spark needs 4 digits
    ("TIME_PARSE", "s STRING", "TIMESTAMP", """
      to_timestamp(CASE WHEN s RLIKE '^[0-9]{1,4}$' THEN lpad(s, 4, '0')
                        ELSE rtrim('Z', replace(s, 'T', ' ')) END)"""),
    ("TIME_IN_INTERVAL", "ts TIMESTAMP, iv STRING", "BOOLEAN", """
      ts >= to_timestamp(rtrim('Z', replace(split_part(iv, '/', 1), 'T', ' ')))
      AND ts < to_timestamp(rtrim('Z', replace(split_part(iv, '/', 2), 'T', ' ')))"""),
    ("TIMESTAMP_TO_MILLIS", "ts TIMESTAMP", "BIGINT", "unix_millis(ts)"),
    ("MILLIS_TO_TIMESTAMP", "ms BIGINT", "TIMESTAMP", "timestamp_millis(ms)"),
    # Deviation from the reference (SafeDivideExprMacro: LONG inputs use
    # long division): SQL UDFs are monomorphic, so SAFE_DIVIDE always
    # coerces to DOUBLE — consistent with Spark's own `/` and
    # try_divide, where int/int is double division.
    ("SAFE_DIVIDE", "a DOUBLE, b DOUBLE", "DOUBLE",
     "CASE WHEN b = 0 THEN NULL ELSE a / b END"),
    ("STRPOS", "h STRING, n STRING", "INT", "instr(h, n)"),
    ("TEXTCAT", "a STRING, b STRING", "STRING", "concat(a, b)"),
    ("CONTAINS_STRING", "s STRING, sub STRING", "BOOLEAN",
     "contains(s, sub)"),
    ("ICONTAINS_STRING", "s STRING, sub STRING", "BOOLEAN",
     "contains(lower(s), lower(sub))"),
    ("STRING_FORMAT", "pat STRING, a STRING", "STRING",
     "format_string(pat, a)"),
    ("PARSE_LONG", "s STRING", "BIGINT", "cast(s AS BIGINT)"),
    ("DECODE_BASE64_UTF8", "s STRING", "STRING",
     "cast(unbase64(s) AS STRING)"),
    # HumanReadableBytes.java:268-325 — binary Ki/Mi/Gi/Ti/Pi ladder,
    # decimal K/M/G/T/P ladder, %.2f fixed decimals, integers below the
    # first unit
    ("HUMAN_READABLE_BINARY_BYTE_FORMAT", "n BIGINT", "STRING", """
      CASE WHEN n IS NULL THEN NULL
           WHEN abs(n) < 1024 THEN concat(n, ' B')
           WHEN abs(n) < 1048576 THEN format_string('%.2f KiB', n / 1024e0)
           WHEN abs(n) < 1073741824 THEN format_string('%.2f MiB', n / 1048576e0)
           WHEN abs(n) < 1099511627776 THEN format_string('%.2f GiB', n / 1073741824e0)
           WHEN abs(n) < 1125899906842624 THEN format_string('%.2f TiB', n / 1099511627776e0)
           ELSE format_string('%.2f PiB', n / 1125899906842624e0) END"""),
    ("HUMAN_READABLE_DECIMAL_BYTE_FORMAT", "n BIGINT", "STRING", """
      CASE WHEN n IS NULL THEN NULL
           WHEN abs(n) < 1000 THEN concat(n, ' B')
           WHEN abs(n) < 1000000 THEN format_string('%.2f KB', n / 1e3)
           WHEN abs(n) < 1000000000 THEN format_string('%.2f MB', n / 1e6)
           WHEN abs(n) < 1000000000000 THEN format_string('%.2f GB', n / 1e9)
           ELSE format_string('%.2f TB', n / 1e12) END"""),
    ("HUMAN_READABLE_DECIMAL_FORMAT", "n BIGINT", "STRING", """
      CASE WHEN n IS NULL THEN NULL
           WHEN abs(n) < 1000 THEN cast(n AS STRING)
           WHEN abs(n) < 1000000 THEN format_string('%.2f K', n / 1e3)
           WHEN abs(n) < 1000000000 THEN format_string('%.2f M', n / 1e6)
           WHEN abs(n) < 1000000000000 THEN format_string('%.2f G', n / 1e9)
           ELSE format_string('%.2f T', n / 1e12) END"""),
    # arrays / MVDs (Druid names; Spark-colliding identical ones omitted)
    ("ARRAY_LENGTH", "arr ARRAY<STRING>", "INT",
     "CASE WHEN arr IS NULL THEN NULL ELSE size(arr) END"),
    ("MV_LENGTH", "arr ARRAY<STRING>", "INT",
     # null MVD -> null (Druid array_length; Spark's legacy size(null)
     # is -1, which is neither engine's SQL contract)
     "CASE WHEN arr IS NULL THEN NULL ELSE size(arr) END"),
    ("ARRAY_OFFSET", "arr ARRAY<STRING>, i INT", "STRING", "get(arr, i)"),
    ("MV_OFFSET", "arr ARRAY<STRING>, i INT", "STRING", "get(arr, i)"),
    ("ARRAY_ORDINAL", "arr ARRAY<STRING>, i INT", "STRING",
     "get(arr, i - 1)"),
    ("MV_ORDINAL", "arr ARRAY<STRING>, i INT", "STRING", "get(arr, i - 1)"),
    # a NULL probe finds a null ELEMENT (Java indexOf(null) — qaUnnest
    # array_offset_of(array[c,c,3], c) with c null expects 0)
    ("ARRAY_OFFSET_OF", "arr ARRAY<STRING>, v STRING", "INT", """
     CASE WHEN v IS NULL THEN
            CASE WHEN array_position(transform(arr, __x -> __x IS NULL),
                                     true) > 0
                 THEN cast(array_position(
                        transform(arr, __x -> __x IS NULL), true) - 1
                      AS INT) END
          WHEN array_position(arr, v) > 0
          THEN cast(array_position(arr, v) - 1 AS INT) END"""),
    ("ARRAY_ORDINAL_OF", "arr ARRAY<STRING>, v STRING", "INT", """
     CASE WHEN v IS NULL THEN
            CASE WHEN array_position(transform(arr, __x -> __x IS NULL),
                                     true) > 0
                 THEN cast(array_position(
                        transform(arr, __x -> __x IS NULL), true)
                      AS INT) END
          WHEN array_position(arr, v) > 0
          THEN cast(array_position(arr, v) AS INT) END"""),
    ("ARRAY_OVERLAP", "a ARRAY<STRING>, b ARRAY<STRING>", "BOOLEAN",
     "arrays_overlap(a, b)"),
    ("MV_OVERLAP", "a ARRAY<STRING>, b ARRAY<STRING>", "BOOLEAN",
     "arrays_overlap(a, b)"),
    ("MV_CONTAINS", "arr ARRAY<STRING>, v STRING", "BOOLEAN",
     "array_contains(arr, v)"),
    ("ARRAY_SLICE", "arr ARRAY<STRING>, s INT, e INT", "ARRAY<STRING>",
     "slice(arr, s + 1, e - s)"),
    ("MV_SLICE", "arr ARRAY<STRING>, s INT, e INT", "ARRAY<STRING>",
     "slice(arr, s + 1, e - s)"),
    # null elements render as the text 'null' (qaArray
    # array_to_string(a_bool,'|') golden: '1|0|null') — EXCEPT the
    # single-null array, which is the whole-null special case
    # (ArrayToStringFunction, Function.java:3643: `raw == null ||
    # raw.length == 1 && raw[0] == null` -> null; qaAggFuncs
    # array_agg A31/A32: the all-null DISTINCT group's [null]
    # stringifies to null)
    ("ARRAY_TO_STRING", "arr ARRAY<STRING>, sep STRING", "STRING",
     "IF(size(arr) = 1 AND arr[0] IS NULL, NULL, "
     "array_join(arr, sep, 'null'))"),
    ("MV_TO_STRING", "arr ARRAY<STRING>, sep STRING", "STRING",
     "IF(size(arr) = 1 AND arr[0] IS NULL, NULL, "
     "array_join(arr, sep, 'null'))"),
    # the separator is a REGEX (reference StringToArrayFunction:
    # String.split — Function.java:3612), with Java's trailing-empty
    # trimming (split('a.b.c','.') = []); null separator splits chars
    # Java String.split: "".split(re) is [""] (the one case the
    # trailing-empty trim does NOT turn into an empty array)
    ("STRING_TO_ARRAY", "s STRING, sep STRING", "ARRAY<STRING>", """
      IF(s = '', array(''),
      slice(split(s, coalesce(sep, '')), 1,
            coalesce(array_max(transform(
              sequence(1, size(split(s, coalesce(sep, '')))),
              __sti -> IF(element_at(split(s, coalesce(sep, '')),
                                     __sti) <> '', __sti, 0))), 0)))"""),
    ("STRING_TO_MV", "s STRING, sep STRING", "ARRAY<STRING>", """
      IF(s = '', array(''),
      slice(split(s, coalesce(sep, '')), 1,
            coalesce(array_max(transform(
              sequence(1, size(split(s, coalesce(sep, '')))),
              __sti -> IF(element_at(split(s, coalesce(sep, '')),
                                     __sti) <> '', __sti, 0))), 0)))"""),
    ("MV_TO_ARRAY", "arr ARRAY<STRING>", "ARRAY<STRING>", "arr"),
    # empty array → NULL MVD (MV columns have no empty form)
    ("ARRAY_TO_MV", "arr ARRAY<STRING>", "ARRAY<STRING>",
     "CASE WHEN size(arr) = 0 THEN NULL ELSE arr END"),
    ("STRLEN", "s STRING", "INT", "length(s)"),
    ("MV_APPEND", "arr ARRAY<STRING>, v STRING", "ARRAY<STRING>",
     "array_append(arr, v)"),
    # Druid MV_PREPEND/ARRAY_PREPEND take (value, arr) — value first
    # (sql-multivalue-string-functions.md); MV_PREPEND registers in
    # that order, ARRAY_PREPEND collides with Spark's (arr, value)
    # builtin and is arg-swapped by the sqlshim rewriter instead
    ("MV_PREPEND", "v STRING, arr ARRAY<STRING>", "ARRAY<STRING>",
     "array_prepend(arr, v)"),
    ("MV_CONCAT", "a ARRAY<STRING>, b ARRAY<STRING>", "ARRAY<STRING>",
     "concat(a, b)"),
    ("ARRAY_CONCAT", "a ARRAY<STRING>, b ARRAY<STRING>", "ARRAY<STRING>",
     "concat(a, b)"),
    ("MV_OFFSET_OF", "arr ARRAY<STRING>, v STRING", "INT",
     "CASE WHEN array_position(arr, v) > 0 THEN cast(array_position(arr, v) - 1 AS INT) END"),
    ("MV_ORDINAL_OF", "arr ARRAY<STRING>, v STRING", "INT",
     "CASE WHEN array_position(arr, v) > 0 THEN cast(array_position(arr, v) AS INT) END"),
    # MV filter family (MultiValueStringOperatorConversions.java):
    # keep-only / drop / prefix / regex element filters
    # empty survivor set = NULL MVD (ListFilteredVirtualColumn;
    # CalciteMultiValueStringQueryTest {null,4} groups — round 7)
    ("MV_FILTER_ONLY", "arr ARRAY<STRING>, allow ARRAY<STRING>",
     "ARRAY<STRING>",
     "nullif(filter(arr, x -> array_contains(allow, x)), "
     "CAST(array() AS ARRAY<STRING>))"),
    ("MV_FILTER_NONE", "arr ARRAY<STRING>, deny ARRAY<STRING>",
     "ARRAY<STRING>",
     "nullif(filter(arr, x -> NOT array_contains(deny, x)), "
     "CAST(array() AS ARRAY<STRING>))"),
    ("MV_FILTER_PREFIX", "arr ARRAY<STRING>, p STRING", "ARRAY<STRING>",
     "nullif(filter(arr, x -> startswith(x, p)), "
     "CAST(array() AS ARRAY<STRING>))"),
    ("MV_FILTER_REGEX", "arr ARRAY<STRING>, r STRING", "ARRAY<STRING>",
     "nullif(filter(arr, x -> x RLIKE r), "
     "CAST(array() AS ARRAY<STRING>))"),
    ("SCALAR_IN_ARRAY", "v STRING, arr ARRAY<STRING>", "BOOLEAN",
     "array_contains(arr, v)"),
    # linear interpolation at rank q*(n-1), matching the reference
    # ArrayQuantileExprMacro and this repo's expr.py _array_quantile:
    # NaN for out-of-range rank, empty arrays, or arrays holding nulls
    ("ARRAY_QUANTILE", "arr ARRAY<DOUBLE>, q DOUBLE", "DOUBLE", """
      CASE WHEN q < 0 OR q > 1 OR size(arr) <= 0
                OR exists(arr, x -> x IS NULL)
           THEN cast('NaN' AS DOUBLE)
           ELSE get(array_sort(arr),
                    cast(floor(q * (size(arr) - 1)) AS INT))
              + (q * (size(arr) - 1) - floor(q * (size(arr) - 1)))
              * (get(array_sort(arr),
                     cast(least(floor(q * (size(arr) - 1)) + 1,
                                size(arr) - 1) AS INT))
                 - get(array_sort(arr),
                       cast(floor(q * (size(arr) - 1)) AS INT)))
      END"""),
    # json
    # SCALAR-ONLY like the reference (JsonValueExprMacro;
    # CalciteNestedDataQueryTest pins JSON_VALUE(nester,'$') = null for
    # object/array rows — round 7): an extracted value that is itself
    # JSON structure yields NULL; JSON_QUERY returns it. Structure is
    # detected by parseability (json_object_keys / json_array_length
    # are NULL for scalars and invalid JSON), not by prefix, so string
    # scalars containing braces survive. _JNP validates the path
    # (must start with '$' — testGroupByInvalidPath error text) and
    # rewrites the first negative array index anywhere in the path
    # (NestedPathFinder supports them — testJsonPathNegativeIndex;
    # qaJsonCols '$.a_array[-1].a_str') to a runtime length-relative
    # positive index (one negative index per path — documented edge).
    # JSON booleans extract as '1'/'0': the reference ingests nested
    # booleans as longs (useStrictBooleans, qaJsonCols
    # json_value(c1,'$.a_bool') = 1 batteries); a JSON STRING leaf
    # whose text is 'true' is indistinguishable here (documented edge).
    # Root path on NON-JSON input returns the raw scalar: a plain
    # STRING expr is a string value to the reference, never parsed
    # (NestedPathFinder over the unwrapped value — qaJsonCols
    # funcs_and_sql_func_json_value.01.all.iq pins
    # json_value('ABCD','$') = 'ABCD'). A string whose text IS valid
    # JSON structure is indistinguishable here (documented edge).
    # a JSON null extracts as the text 'null' from get_json_object;
    # Druid's json_value returns SQL NULL there (qaArray schmdisc)
    ("JSON_VALUE", "j STRING, p STRING", "STRING", f"""
      CASE WHEN p IN ('$', '$.') AND j IS NOT NULL AND j <> ''
             AND get_json_object(j, '$') IS NULL THEN j
           WHEN p RLIKE '\\\\[-[0-9]+\\\\].' THEN NULL
           -- NOTE (round 12, supersedes the round-11 NULL-side
           -- adjudication): an EMPTY ARRAY leaf is the empty string
           -- — NON-null for IS [NOT] NULL (func_json_value A046/A047
           -- /A053/A054/A063/A064 + A086/A088/A091 pin the 2-of-4
           -- splits) while rendering blank; an EMPTY OBJECT leaf
           -- stays NULL (A043/A044/A049/A050/A085/A087 pin 4-of-4
           -- IS NULL). The DISTINCT goldens (A045/A051/A052/A061/
           -- A062, one blank row) hold because a STRING grouping
           -- dimension normalizes '' to null (same normalization as
           -- MVD elements), which the sqlshim DISTINCT wrap applies.
           -- Non-empty containers stay NULL (scalars only).
           WHEN {_JGET} = '[]' THEN ''
           WHEN json_object_keys({_JGET}) IS NOT NULL
             OR json_array_length({_JGET}) IS NOT NULL
           THEN NULL
           WHEN {_JGET} = 'true' THEN '1'
           WHEN {_JGET} = 'false' THEN '0'
           ELSE nullif({_JGET}, 'null') END"""),
    # json_query keeps structure and renders it as NESTED_DATA: string
    # scalars come back JSON-quoted (testJsonQuery pins '"hello"'),
    # numbers/booleans bare, backslash+quote JSON-escaped (control
    # chars inside strings are not re-escaped — documented edge)
    ("JSON_QUERY", "j STRING, p STRING", "STRING", f"""
      CASE WHEN p IN ('$', '$.') AND j IS NOT NULL AND j <> ''
             AND get_json_object(j, '$') IS NULL
           THEN {_jquote("j")}
           WHEN {_JGET} IS NULL THEN NULL
           WHEN {_JGET} = 'null' THEN NULL
           WHEN json_object_keys({_JGET}) IS NOT NULL
             OR json_array_length({_JGET}) IS NOT NULL
             OR {_JGET} IN ('true', 'false')
             OR try_cast({_JGET} AS DOUBLE) IS NOT NULL
           THEN {_JGET}
           ELSE {_jquote(_JGET)}
      END"""),
    # JSON_QUERY over a source KNOWN to hold string elements (a
    # varchar-RETURNING json_value chain or a variant array stored as
    # array<string>): every extracted leaf renders JSON-QUOTED —
    # get_json_object loses the quoting, and the reference's
    # NESTED_DATA render keeps it (qaArray ops_funcs_json_funcs
    # C19-C21 expect '"true"', not 'true')
    ("JSON_QUERY_STRSRC", "j STRING, p STRING", "STRING", f"""
      CASE WHEN p IN ('$', '$.') THEN j
           WHEN {_JGET} IS NULL THEN NULL
           WHEN {_JGET} = 'null' THEN NULL
           WHEN json_object_keys({_JGET}) IS NOT NULL
             OR json_array_length({_JGET}) IS NOT NULL
           THEN {_JGET}
           ELSE {_jquote(_JGET)}
      END"""),
    # root path is spelled '$' or '$.' in the reference's tests
    # (NestedDataExpressions.java json_keys); keys of scalars/arrays/
    # non-JSON are NULL (testJsonKeysNonJsonInput)
    # objects -> key names; ARRAYS -> index strings ['0','1',...]
    # (qaJsonCols func_json_keys golden: json_keys(c1,'$.a_array') =
    # [0, 1], empty array = []); scalars -> null
    ("JSON_KEYS", "j STRING, p STRING", "ARRAY<STRING>", f"""
      CASE WHEN json_object_keys(CASE WHEN p IN ('$', '$.') THEN j
                                      ELSE {_JGET} END) IS NOT NULL
           THEN json_object_keys(CASE WHEN p IN ('$', '$.') THEN j
                                      ELSE {_JGET} END)
           WHEN json_array_length(CASE WHEN p IN ('$', '$.') THEN j
                                       ELSE {_JGET} END) > 0
           THEN transform(sequence(0, json_array_length(
                    CASE WHEN p IN ('$', '$.') THEN j
                         ELSE {_JGET} END) - 1),
                    __jki -> cast(__jki AS STRING))
           WHEN json_array_length(CASE WHEN p IN ('$', '$.') THEN j
                                       ELSE {_JGET} END) = 0
           THEN array()
           ELSE NULL END"""),
    # json_query_array (NestedDataExpressions.java:651): JSON array at
    # path → ARRAY of element strings (objects come back as JSON text)
    ("JSON_QUERY_ARRAY", "j STRING, p STRING", "ARRAY<STRING>",
     f"from_json({_JGET}, 'ARRAY<STRING>')"),
    # json_paths (NestedDataExpressions.java:743): '$.'-prefixed paths.
    # Non-JSON / scalar input reports the root path ['$']
    # (testJsonPathsNonJsonInput pins JSON_PATHS(1234) = ['$']);
    # top-level arrays report per-index paths. Object walk descends to
    # depth 2 (documented limit of the SQL-UDF form; deeper levels
    # report the depth-2 prefix).
    # (JSON_PATHS registers as an Arrow-batched pandas UDF below —
    # the leaf walk is recursive over arbitrary depth; a SQL UDF here
    # would fail CREATE OR REPLACE against the non-SQL registration)
    # (TRY_PARSE_JSON / PARSE_JSON are Spark builtins — variant-typed)
    # TO_JSON_STRING (NestedDataExpressions.java:245 ToJsonStringExpr:
    # jackson-serialize the VALUE): inputs arrive as strings (variants
    # and SQL arrays implicitly cast). Parseable JSON re-serializes to
    # the engine's canonical compact form (same normalization a
    # variant→string cast applies — so ARRAY[1,2,3]'s "[1, 2, 3]" cast
    # rendering becomes the JSON "[1,2,3]"); a non-JSON string is a
    # VALUE and serializes QUOTED ("aaa" → "\"aaa\"",
    # CalciteNestedDataQueryTest.java testToJsonAndParseJson). The
    # array(j) trick delegates string escaping to Spark's JSON writer.
    ("TO_JSON_STRING", "j STRING", "STRING", """
      CASE WHEN j IS NULL THEN NULL
           WHEN try_parse_json(j) IS NOT NULL
             THEN cast(try_parse_json(j) AS STRING)
           ELSE substring(to_json(array(j)), 2,
                          length(to_json(array(j))) - 2) END"""),
    # DECODE_BASE64_COMPLEX(typeName, base64) — reference
    # (DecodeBase64ComplexOperatorConversion): base64 of a serialized
    # complex value → the complex value. The engine's HLL/theta/KLL
    # complex values ARE Datasketches-standard binary blobs (Spark's
    # native sketch functions emit/consume the standard formats), so
    # decoding is unbase64; the type tag is advisory — the consuming
    # function interprets the blob (e.g. HLL_SKETCH_ESTIMATE over a
    # decoded HLLSketch).
    ("DECODE_BASE64_COMPLEX", "t STRING, s STRING", "BINARY",
     "unbase64(s)"),
    # radix parse (1-arg form gets ', 10' appended by sqlshim);
    # negative decimal via plain cast; conv() is unsigned, so a signed
    # non-decimal parses magnitude and reapplies the sign
    # (java.lang.Long.parseLong(s, radix) semantics)
    # Long.parseLong(s, radix) semantics (Function.java:720
    # ParseLong): WHOLE string must be valid digits of the radix
    # (optional sign; 0x stripped only for radix 16) — a partial
    # parse like conv()'s prefix scan returns NULL instead
    # (qaAggFuncs parse_long over string_agg output)
    ("PARSE_LONG", "s STRING, radix INT", "BIGINT", """
      CASE WHEN s IS NULL OR NOT ((CASE WHEN (CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END) LIKE '-%' OR (CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END) LIKE '+%' THEN substring((CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END), 2) ELSE (CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END) END) <> '' AND (CASE WHEN radix = 16 THEN (CASE WHEN (CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END) LIKE '-%' OR (CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END) LIKE '+%' THEN substring((CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END), 2) ELSE (CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END) END) RLIKE '^[0-9a-fA-F]+$' WHEN radix = 10 THEN (CASE WHEN (CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END) LIKE '-%' OR (CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END) LIKE '+%' THEN substring((CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END), 2) ELSE (CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END) END) RLIKE '^[0-9]+$' WHEN radix = 8 THEN (CASE WHEN (CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END) LIKE '-%' OR (CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END) LIKE '+%' THEN substring((CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END), 2) ELSE (CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END) END) RLIKE '^[0-7]+$' WHEN radix = 2 THEN (CASE WHEN (CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END) LIKE '-%' OR (CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END) LIKE '+%' THEN substring((CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END), 2) ELSE (CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END) END) RLIKE '^[01]+$' ELSE lower(conv(conv((CASE WHEN (CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END) LIKE '-%' OR (CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END) LIKE '+%' THEN substring((CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END), 2) ELSE (CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END) END), radix, 10), 10, radix)) = lower(CASE WHEN (CASE WHEN (CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END) LIKE '-%' OR (CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END) LIKE '+%' THEN substring((CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END), 2) ELSE (CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END) END) RLIKE '^0+.' THEN regexp_replace((CASE WHEN (CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END) LIKE '-%' OR (CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END) LIKE '+%' THEN substring((CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END), 2) ELSE (CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END) END), '^0+', '') ELSE (CASE WHEN (CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END) LIKE '-%' OR (CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END) LIKE '+%' THEN substring((CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END), 2) ELSE (CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END) END) END) END)) THEN NULL
           WHEN (CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END) LIKE '-%'
             THEN -cast(conv((CASE WHEN (CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END) LIKE '-%' OR (CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END) LIKE '+%' THEN substring((CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END), 2) ELSE (CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END) END), radix, 10) AS BIGINT)
           ELSE cast(conv((CASE WHEN (CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END) LIKE '-%' OR (CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END) LIKE '+%' THEN substring((CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END), 2) ELSE (CASE WHEN radix = 16 AND (s LIKE '0x%' OR s LIKE '0X%') THEN substring(s, 3) ELSE s END) END), radix, 10) AS BIGINT) END"""),
    # Function.java RepeatFunc:3111 — a count below 1 yields NULL (not
    # the empty string Spark's builtin gives). Spark refuses SQL UDFs
    # shadowing builtins, so the shim rewrites REPEAT( → DRUID_REPEAT(
    # (same for LEFT/RIGHT below).
    ("DRUID_REPEAT", "s STRING, n INT", "STRING",
     "CASE WHEN n >= 1 THEN repeat(s, n) END"),
    # LeftFunc/RightFunc (Function.java:2933,2961): a NEGATIVE length
    # is a validation error in the reference, not an empty string
    ("DRUID_LEFT", "s STRING, n INT", "STRING", """
      CASE WHEN n < 0 THEN CAST(raise_error(
             'Function[left] needs a positive integer as the second argument')
             AS STRING)
           ELSE substring(s, 1, n) END"""),
    ("DRUID_RIGHT", "s STRING, n INT", "STRING", """
      CASE WHEN n < 0 THEN CAST(raise_error(
             'Function[right] needs a positive integer as the second argument')
             AS STRING)
           WHEN n = 0 THEN ''
           ELSE substring(s, -least(n, length(s)), 2147483647) END"""),
    # (STRING_FORMAT is variadic — sqlshim rewrites it to Spark's
    # format_string, which is the same java.lang.String.format surface)
    # bitwise (Druid SQL names)
    ("BITWISE_AND", "a BIGINT, b BIGINT", "BIGINT", "a & b"),
    ("BITWISE_OR", "a BIGINT, b BIGINT", "BIGINT", "a | b"),
    ("BITWISE_XOR", "a BIGINT, b BIGINT", "BIGINT", "a ^ b"),
    ("BITWISE_COMPLEMENT", "a BIGINT", "BIGINT", "~a"),
    ("BITWISE_SHIFT_LEFT", "a BIGINT, n INT", "BIGINT", "shiftleft(a, n)"),
    ("BITWISE_SHIFT_RIGHT", "a BIGINT, n INT", "BIGINT", "shiftright(a, n)"),
    # IEEE-754 bit reinterpretation (Function.java
    # BitwiseConvertDoubleToLongBits / BitwiseConvertLongBitsToDouble)
    # delegates to Arrow-batched pandas UDFs (registered below) —
    # Spark's reflect() is NONDETERMINISTIC, so planners pull it out
    # of its null guard and crash on null inputs in join/subquery
    # shapes (qaSql scalar_numeric A27/A28 IN-subquery batteries).
    # The CASE guard stays here: pandas batches merge SQL NULL into
    # NaN, so the SQL layer decides nullness.
    ("BITWISE_CONVERT_DOUBLE_TO_LONG_BITS", "a DOUBLE", "BIGINT",
     "CASE WHEN a IS NOT NULL THEN __ds_d2l_bits(a) END"),
    # the long bit pattern travels as STRING: an int64 Arrow batch
    # containing any NULL is converted to float64 pandas, silently
    # rounding patterns beyond 2^53 before the UDF ever sees them
    ("BITWISE_CONVERT_LONG_BITS_TO_DOUBLE", "a BIGINT", "DOUBLE",
     "CASE WHEN a IS NOT NULL THEN __ds_l2d_bits(CAST(a AS STRING)) END"),
    # ipv4
    ("IPV4_PARSE", "s STRING", "BIGINT", """
      cast(split_part(s, '.', 1) AS BIGINT) * 16777216 +
      cast(split_part(s, '.', 2) AS BIGINT) * 65536 +
      cast(split_part(s, '.', 3) AS BIGINT) * 256 +
      cast(split_part(s, '.', 4) AS BIGINT)"""),
    ("IPV4_STRINGIFY", "n BIGINT", "STRING", """
      concat(cast((n div 16777216) % 256 AS STRING), '.',
             cast((n div 65536) % 256 AS STRING), '.',
             cast((n div 256) % 256 AS STRING), '.',
             cast(n % 256 AS STRING))"""),
    # addr may be a dotted string or a long; subnet is 'a.b.c.d/prefix'
    ("IPV4_MATCH", "addr STRING, subnet STRING", "BOOLEAN", """
      floor((CASE WHEN addr RLIKE '^[0-9]+$' THEN cast(addr AS BIGINT)
            ELSE cast(split_part(addr, '.', 1) AS BIGINT) * 16777216 +
                 cast(split_part(addr, '.', 2) AS BIGINT) * 65536 +
                 cast(split_part(addr, '.', 3) AS BIGINT) * 256 +
                 cast(split_part(addr, '.', 4) AS BIGINT) END)
       / pow(2, 32 - cast(split_part(subnet, '/', 2) AS INT))) =
      floor((cast(split_part(split_part(subnet, '/', 1), '.', 1) AS BIGINT) * 16777216 +
        cast(split_part(split_part(subnet, '/', 1), '.', 2) AS BIGINT) * 65536 +
        cast(split_part(split_part(subnet, '/', 1), '.', 3) AS BIGINT) * 256 +
        cast(split_part(split_part(subnet, '/', 1), '.', 4) AS BIGINT))
       / pow(2, 32 - cast(split_part(subnet, '/', 2) AS INT)))"""),
    # ipv6_match (proc/query/expression/IPv6AddressMatchExprMacro.java):
    # canonical-expand '::', hex groups → 128-bit string, prefix compare.
    # Helper first (SQL UDFs may call previously-registered SQL UDFs).
    ("IPV6_ADDRESS_BITS__", "a STRING", "STRING", """
      array_join(transform(
        filter(split(replace(lower(a), '::',
                 concat(':', repeat('0:',
                   8 - size(filter(split(lower(a), ':'),
                                   g -> g <> ''))))), ':'),
               g -> g <> ''),
        g -> lpad(bin(cast(conv(g, 16, 10) AS BIGINT)), 16, '0')), '')"""),
    ("IPV6_MATCH", "addr STRING, subnet STRING", "BOOLEAN", """
      substr(IPV6_ADDRESS_BITS__(addr), 1,
             cast(split_part(subnet, '/', 2) AS INT)) =
      substr(IPV6_ADDRESS_BITS__(split_part(subnet, '/', 1)), 1,
             cast(split_part(subnet, '/', 2) AS INT))"""),
    # numeric truncation toward zero (Druid TRUNCATE/TRUNC; the 1-arg
    # form is rewritten to (x, 0) by sqlshim)
    ("TRUNCATE", "x DOUBLE, d INT", "DOUBLE",
     "cast(x * pow(10, d) AS BIGINT) / pow(10, d)"),
    # Java Math log/sqrt semantics (Function.java
    # DoubleUnivariateMathFunction): log(0) = -Infinity, log(neg) and
    # sqrt(neg) = NaN; null stays null (no WHEN matches). Spark's
    # builtins return NULL for all non-positive inputs.
    ("DRUID_LN", "x DOUBLE", "DOUBLE",
     "CASE WHEN x > 0 THEN ln(x) WHEN x = 0 THEN "
     "cast('-Infinity' AS DOUBLE) WHEN x < 0 THEN "
     "cast('NaN' AS DOUBLE) END"),
    ("DRUID_LOG10", "x DOUBLE", "DOUBLE",
     "CASE WHEN x > 0 THEN log10(x) WHEN x = 0 THEN "
     "cast('-Infinity' AS DOUBLE) WHEN x < 0 THEN "
     "cast('NaN' AS DOUBLE) END"),
    ("DRUID_SQRT", "x DOUBLE", "DOUBLE",
     "CASE WHEN x >= 0 THEN sqrt(x) WHEN x < 0 THEN "
     "cast('NaN' AS DOUBLE) END"),
    # (TRUNC is the same op but collides with Spark's date trunc
    # builtin, which SQL UDFs cannot replace — sqlshim rewrites
    # TRUNC( → TRUNCATE( instead)
    # shallow JSON object merge (NestedDataExpressions json_merge):
    # right-hand keys win; values stay typed via variant
    # right-hand keys win; overlapping left keys are filtered first so
    # map_concat never sees duplicates (which throw by default)
    ("JSON_MERGE", "a STRING, b STRING", "STRING", """
      to_json(map_concat(
        map_filter(from_json(a, 'map<string,variant>'),
                   (k, v) -> NOT map_contains_key(
                       from_json(b, 'map<string,variant>'), k)),
        from_json(b, 'map<string,variant>')))"""),
]


def _json_paths_series(s):
    """JSON_PATHS leaf-path enumeration (NestedDataExpressions.java:743
    JsonPathsExpr / NestedPathFinder): recursive walk — scalars and
    nulls are leaves, an EMPTY ARRAY is its own leaf, an empty object
    contributes nothing, non-JSON input reports the root ['$'].  The
    reference collects into a set (arbitrary order); the conformance
    harness compares path lists as multisets.  Arrow-batched pandas
    UDF: the walk is recursive over arbitrary depth, which a pure SQL
    expression can't express."""
    import json as _json

    def walk(v, prefix, out):
        if isinstance(v, dict):
            for k, val in v.items():
                walk(val, f"{prefix}.{k}", out)
        elif isinstance(v, list):
            # a list with NO container elements is its own leaf: the
            # nested column format stores primitive arrays as ARRAY
            # leaves (qaArray ops_funcs_json_funcs C22:
            # json_paths(a_nested) lists $[0], not $[0][0..2]); only
            # lists holding objects/lists recurse (and the empty list
            # is a leaf both ways)
            if not any(isinstance(x, (dict, list)) for x in v):
                out.append(prefix)
                return
            for i, val in enumerate(v):
                walk(val, f"{prefix}[{i}]", out)
        else:
            out.append(prefix)

    def one(j):
        if j is None:
            return ["$"]  # NULL input reports the root (A022 golden)
        try:
            v = _json.loads(j)
        except (ValueError, TypeError):
            return ["$"]
        if not isinstance(v, (dict, list)):
            return ["$"]
        out: list = []
        walk(v, "$", out)
        return out

    return s.apply(one)


def _smile_encode(value) -> bytes:
    """Jackson SMILE serialization of a JSON value, matching the
    reference's ColumnSerializerUtils.SMILE_MAPPER output
    (SmileFactory with ENCODE_BINARY_AS_7BIT disabled, WRITE_HEADER
    on, shared property names on, ORDER_MAP_ENTRIES_BY_KEYS): header
    3A 29 0A 05, zigzag big-endian vints with a 6-bit 0x80-marked
    last byte, 10-byte 7-bit doubles, tiny/short ASCII and Unicode
    strings, sorted object keys with short-name back-references.
    Format: github.com/FasterXML/smile-format-specification."""
    out = bytearray(b":)\n\x05")
    shared_names: dict[str, int] = {}

    def vint(n: int):
        # zigzag, then big-endian 7-bit groups; last byte holds the
        # SIX least-significant bits with the high bit set
        z = (n << 1) ^ (n >> 63) if n < 0 else (n << 1)
        last = 0x80 | (z & 0x3F)
        z >>= 6
        groups = []
        while z:
            groups.append(z & 0x7F)
            z >>= 7
        out.extend(reversed(groups))
        out.append(last)

    def enc(v):
        if v is None:
            out.append(0x21)
        elif v is True:
            out.append(0x23)
        elif v is False:
            out.append(0x22)
        elif isinstance(v, int):
            if -16 <= v <= 15:
                z = (v << 1) ^ (v >> 63) if v < 0 else (v << 1)
                out.append(0xC0 + z)
            elif -(1 << 31) <= v < (1 << 31):
                out.append(0x24)
                vint(v)
            else:
                out.append(0x25)
                vint(v)
        elif isinstance(v, float):
            out.append(0x29)
            import struct as _struct
            bits = _struct.unpack(">Q", _struct.pack(">d", v))[0]
            out.append((bits >> 63) & 0x7F)
            for sh in range(56, -1, -7):
                out.append((bits >> sh) & 0x7F)
        elif isinstance(v, str):
            b = v.encode("utf-8")
            if not b:
                out.append(0x20)
            elif len(b) == len(v):  # pure ASCII
                if len(b) <= 32:
                    out.append(0x40 + len(b) - 1)
                    out.extend(b)
                elif len(b) <= 64:
                    out.append(0x60 + len(b) - 33)
                    out.extend(b)
                else:
                    out.append(0xE0)
                    out.extend(b)
                    out.append(0xFC)
            else:
                if 2 <= len(b) <= 33:
                    out.append(0x80 + len(b) - 2)
                    out.extend(b)
                elif 34 <= len(b) <= 65:
                    out.append(0xA0 + len(b) - 34)
                    out.extend(b)
                else:
                    out.append(0xE4)
                    out.extend(b)
                    out.append(0xFC)
        elif isinstance(v, list):
            out.append(0xF8)
            for x in v:
                enc(x)
            out.append(0xF9)
        elif isinstance(v, dict):
            out.append(0xFA)
            for k in sorted(v.keys()):
                key(k)
                enc(v[k])
            out.append(0xFB)
        else:
            enc(str(v))

    def key(k: str):
        idx = shared_names.get(k)
        if idx is not None:
            if idx < 64:
                out.append(0x40 + idx)
            else:
                # long shared-name reference: 2 bytes, 0x30-0x33
                # carry the index's high bits (indices 64-1023)
                out.append(0x30 + (idx >> 8))
                out.append(idx & 0xFF)
            return
        b = k.encode("utf-8")
        if not b:
            out.append(0x20)
            return
        if len(b) == len(k) and len(b) <= 64:
            out.append(0x80 + len(b) - 1)
            out.extend(b)
        elif len(b) != len(k) and 2 <= len(b) <= 57:
            out.append(0xC0 + len(b) - 2)
            out.extend(b)
        else:
            out.append(0x34)
            out.extend(b)
            out.append(0xFC)
        # first encode only, and only names <= 64 encoded bytes are
        # shared (Jackson SmileGenerator._addSeenName); a full table
        # is cleared and restarted per the SMILE spec
        if len(b) <= 64:
            if len(shared_names) >= 1024:
                shared_names.clear()
            shared_names[k] = len(shared_names)

    enc(value)
    return bytes(out)


_XXP1, _XXP2, _XXP3 = (11400714785074694791, 14029467366897019727,
                       1609587929392839161)
_XXP4, _XXP5 = 9650029242287828579, 2870177450012600261
_M64 = (1 << 64) - 1


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & _M64


def _xxh64(data: bytes, seed: int) -> int:
    """Pure-Python XXH64 (public spec github.com/Cyan4973/xxHash;
    validated against the published vectors in tests)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _XXP1 + _XXP2) & _M64
        v2 = (seed + _XXP2) & _M64
        v3 = seed & _M64
        v4 = (seed - _XXP1) & _M64
        while i <= n - 32:
            lane = int.from_bytes(data[i:i + 8], "little")
            v1 = (_rotl((v1 + lane * _XXP2) & _M64, 31) * _XXP1) & _M64
            lane = int.from_bytes(data[i + 8:i + 16], "little")
            v2 = (_rotl((v2 + lane * _XXP2) & _M64, 31) * _XXP1) & _M64
            lane = int.from_bytes(data[i + 16:i + 24], "little")
            v3 = (_rotl((v3 + lane * _XXP2) & _M64, 31) * _XXP1) & _M64
            lane = int.from_bytes(data[i + 24:i + 32], "little")
            v4 = (_rotl((v4 + lane * _XXP2) & _M64, 31) * _XXP1) & _M64
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
             + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ ((_rotl((v * _XXP2) & _M64, 31) * _XXP1)
                       & _M64)) * _XXP1 + _XXP4) & _M64
    else:
        h = (seed + _XXP5) & _M64
    h = (h + n) & _M64
    while i <= n - 8:
        lane = int.from_bytes(data[i:i + 8], "little")
        h = ((_rotl(h ^ ((_rotl((lane * _XXP2) & _M64, 31) * _XXP1)
                         & _M64), 27) * _XXP1) + _XXP4) & _M64
        i += 8
    if i <= n - 4:
        lane = int.from_bytes(data[i:i + 4], "little")
        h = ((_rotl(h ^ ((lane * _XXP1) & _M64), 23) * _XXP2)
             + _XXP3) & _M64
        i += 4
    while i < n:
        h = ((_rotl(h ^ ((data[i] * _XXP5) & _M64), 11)) * _XXP1) \
            & _M64
        i += 1
    h = ((h ^ (h >> 33)) * _XXP2) & _M64
    h = ((h ^ (h >> 29)) * _XXP3) & _M64
    return h ^ (h >> 32)


def _json_complex_hash_series(s):
    """JSON_COMPLEX_HASH64(jsonText) — the reference's COMPLEX<json>
    ordering key for non-null/non-string/non-number values:
    StructuredData.compareTo falls through to
    Long.compare(XXH64(SMILE(value), seed 0x9747b28c), ...)
    (StructuredData.java:42-99,151-188). Arrow-batched; returns the
    SIGNED long Java compares."""
    import json as _json

    def one(j):
        if j is None:
            return None
        try:
            v = _json.loads(j)
        except (ValueError, TypeError):
            v = j
        # StructuredData.SEED is the Java int 0x9747b28c — NEGATIVE,
        # so it sign-extends into the long-seed hash call
        h = _xxh64(_smile_encode(v), 0xFFFFFFFF9747B28C)
        return h - (1 << 64) if h >= (1 << 63) else h

    return s.apply(one)


# Session-scoped registration stamp: the temp-function surface lives on
# the SparkSession, so several engines sharing one session must not each
# re-run the ~80 CREATE FUNCTION round-trips (measured seconds per pass,
# dominated by per-statement parse). Weakly keyed by the session object
# (same rationale as engine._SQL_VIEWS_STAMP); the lock serializes the
# background prewarm thread against a foreground sql() racing it.
import threading as _threading
import weakref as _weakref

_REG_LOCK = _threading.Lock()
_REG_STAMP: "_weakref.WeakKeyDictionary[SparkSession, int]" = \
    _weakref.WeakKeyDictionary()


def register_druid_functions(spark: SparkSession) -> int:
    """Idempotently register the surface (once per SparkSession);
    returns the session's registered-function count either way."""
    with _REG_LOCK:
        if _REG_STAMP.get(spark):
            return _REG_STAMP[spark]
        n = _register_druid_functions_impl(spark)
        _REG_STAMP[spark] = n
        return n


def prewarm_druid_functions(spark: SparkSession) -> "_threading.Thread":
    """Kick off function registration on a daemon thread so the one-time
    ~80-statement DDL pass overlaps engine warm-up instead of landing on
    the first interactive sql() call. Callers needing the surface just
    call register_druid_functions() — the stamp + lock make the join
    implicit and idempotent."""
    t = _threading.Thread(target=lambda: register_druid_functions(spark),
                          name="druid-fn-prewarm", daemon=True)
    t.start()
    return t


def _register_druid_functions_impl(spark: SparkSession) -> int:
    n = 0
    # python-backed helpers FIRST: SQL temporary-function bodies that
    # delegate to them resolve the reference at creation
    from pyspark.sql.functions import pandas_udf
    import struct as _struct

    def _d2l(s):
        # SQL NULLs arrive as NaN; the SQL-layer CASE guard discards
        # those rows, and true-NaN inputs canonicalize like
        # doubleToLongBits (0x7FF8000000000000)
        return s.apply(lambda x: None if x is None else _struct.unpack(
            ">q", _struct.pack(">d", x))[0])

    def _l2d(s):
        # input is the decimal STRING render of the long (see the SQL
        # body) so nullable batches never round through float64
        return s.apply(
            lambda x: None if x is None else _struct.unpack(
                ">d", _struct.pack(">q", int(x)))[0])

    def _hll_d2b(s):
        # Druid-parity HllSketch input for DOUBLE columns: the LE
        # bytes of doubleToLongBits(d), with BaseHllSketch.update
        # (double)'s canonicalization (-0.0 -> 0.0; every NaN -> the
        # canonical quiet NaN).  MurmurHash3's long[]{bits} entry
        # point (what update(double) hashes) equals its byte[] entry
        # over these 8 LE bytes, so feeding them to Spark's JVM
        # Datasketches hll_sketch_agg reproduces the reference's
        # hash stream exactly.  SQL NULLs arrive as NaN in the
        # float64 batch; the SQL-layer CASE guard discards those
        # rows, and true-NaN inputs canonicalize identically.
        def one(x):
            if x is None:
                return None
            if x != x:
                return b"\x00\x00\x00\x00\x00\x00\xf8\x7f"
            return _struct.pack("<d", x if x != 0.0 else 0.0)
        return s.apply(one)

    spark.udf.register("__ds_d2l_bits", pandas_udf(_d2l, "long"))
    spark.udf.register("__ds_l2d_bits", pandas_udf(_l2d, "double"))
    spark.udf.register("__ds_hll_d2b", pandas_udf(_hll_d2b, "binary"))
    for name, args, ret, body in _FUNCS:
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({args}) "
            f"RETURNS {ret} RETURN {body}")
        n += 1
    from pyspark.sql.functions import pandas_udf
    spark.udf.register("json_paths",
                       pandas_udf(_json_paths_series, "array<string>"))
    spark.udf.register("json_complex_hash64",
                       pandas_udf(_json_complex_hash_series, "long"))
    # readers for the two Datasketches binary formats Spark lacks a
    # function for (classic quantiles DoublesSketch, tuple
    # ArrayOfDoubles) — lets re-ingested reference sketch-metric blob
    # columns be queried directly (druid_spark.functions.sketch_interop)
    from druid_spark.functions.sketch_interop import (
        decode_tuple_aod, quantiles_doubles_quantile,
        tuple_aod_estimate)

    def _qq(blobs, qs):
        import pandas as _pd
        return _pd.Series([
            None if b is None else quantiles_doubles_quantile(bytes(b),
                                                              float(q))
            for b, q in zip(blobs, qs)])

    def _aod_est(blobs):
        return blobs.apply(
            lambda b: None if b is None else float(
                tuple_aod_estimate(bytes(b))))

    def _aod_means(blobs):
        def one(b):
            if b is None:
                return None
            d = decode_tuple_aod(bytes(b))
            if not d["keys"]:
                return []
            cols = list(zip(*d["values"]))
            return [sum(c) / len(c) for c in cols]
        return blobs.apply(one)

    spark.udf.register("ds_quantiles_sketch_quantile",
                       pandas_udf(_qq, "double"))
    spark.udf.register("ds_tuple_aod_estimate",
                       pandas_udf(_aod_est, "double"))
    spark.udf.register("ds_tuple_aod_means",
                       pandas_udf(_aod_means, "array<double>"))

    return n + 7
