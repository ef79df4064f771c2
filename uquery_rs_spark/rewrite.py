"""Pre-Catalyst SQL rewriting — the one genuinely custom component
(SURVEY.md §7 Phase 2).

Resolves DuckDB-gateway idioms into Spark SQL before spark.sql() sees the
text. Each rewrite is oracle-checked end-to-end (same SQL on DuckDB):

Sources & safety
1. path-as-table:  FROM 'x.parquet'  →  FROM uq_file_<hash>  (temp view
   over spark.read; reference src/main.rs:327,350)
2. table functions:  read_parquet('x') / read_csv('x', header=true) /
   read_json('x')  →  same view mechanism, args → reader options
   (reference src/main.rs:307)
3. filesystem sandbox: every resolved local path must fall under an
   allowed directory (reference `SET allowed_directories` +
   enable_external_access, src/cli/options.rs:193-199 — Spark has no
   built-in equivalent, so it's enforced here, before any read)
4. config freeze: SET/INSTALL/LOAD/ATTACH/CREATE SECRET from clients are
   rejected (reference lock_configuration=true, options.rs:199)

Statement forms
5. SUMMARIZE → one-scan per-column stats; PIVOT statement (values from a
   DISTINCT probe) / UNPIVOT statement → Spark PIVOT/UNPIVOT clauses;
   FROM-first syntax (`FROM t [SELECT …]`); UNION [ALL] BY NAME
   (LIMIT-0 schema probes align columns by name)

Query sugar & dialect
6. QUALIFY, DISTINCT ON, * EXCLUDE, * REPLACE (LIMIT-0 probe),
   GROUP/ORDER BY ALL (native), `//` int division, USING SAMPLE →
   TABLESAMPLE, `col->>'k'` → get_json_object
7. bracket syntax: `[..]` literals → array(), 1-based l[i]/l[a:b] →
   get/element_at/slice (negative bounds count from the end; inverted
   ranges clamp to [] like DuckDB), list comprehensions →
   transform(filter(...)), MAP {} literals → map() (subscripts on a map
   literal become element_at whatever the key type); polymorphic len()
   → size()/length() per argument type (LIMIT-0 probe)
8. functions: list_*/string_split/regexp_matches renames (string_split
   escapes its literal separator — Spark's split is regex), struct_pack(k
   := v) → named_struct, generate_series (scalar → sequence, FROM-position
   → exploded subquery), string_agg(... ORDER BY) → listagg WITHIN GROUP,
   strftime/strptime C-format translation; argument-aware semantics:
   string literals normalized from DuckDB escape-free space to Spark
   escape space (so '\\w' survives the parser), regexp_replace first-match
   default + RE2 flag arg + \\1→$1 backrefs, regexp_extract[_all] 2-arg
   whole-match default, list_sort NULL placement + direction strings,
   array_to_string NULL on empty list
9. macros: scalar + parameterized table macros from attached .db files
   inline at rewrite time (DuckDB bind-time semantics); aggregate macro
   geomean(x) → exp(avg(ln(x)))
"""

from __future__ import annotations

import hashlib
import logging
import os
import re
import threading
import uuid
from contextlib import contextmanager

from pyspark.sql import SparkSession

from .errors import UQueryError
from .sources.files import REMOTE_SCHEMES, resolve_path

_PROBE_TLS = threading.local()


def _duckdb_version() -> str:
    """Installed DuckDB version (the dialect the gateway mimics)."""
    try:
        import duckdb

        return duckdb.__version__
    except ImportError:  # pragma: no cover
        return "1.0.0"


class _ProbeNoiseFilter(logging.Filter):
    """Suppress PySpark's SQLQueryContextLogger ERROR records emitted by
    EXPECTED analysis failures inside schema/type probes (VERDICT r7
    'What's wrong' #2): the poly resolvers try a candidate form and
    catch the AnalysisException — without this filter every PASSING
    query that exercises a probe dumps a full Py4J stack trace at ERROR
    into the service log, burying real errors. Thread-local so pooled
    concurrent rewrites never mask each other's genuine failures."""

    def filter(self, record):  # noqa: A003 - logging.Filter API
        return not getattr(_PROBE_TLS, "quiet", False)


# CRITICAL: create the logger through PySparkLogger so it gets pyspark's
# Logger subclass — a bare logging.getLogger() here would REGISTER a
# plain Logger under the name first, and pyspark's later
# PySparkLogger.getLogger() returns whatever instance the name already
# maps to, whose .error(..., errorClass=...) then TypeErrors (caught
# live on the EXTRACT-unsupported logging path, round 8).
from pyspark.logger import PySparkLogger  # noqa: E402

PySparkLogger.getLogger("SQLQueryContextLogger").addFilter(_ProbeNoiseFilter())


@contextmanager
def _probe_quiet():
    """Mark the current thread as running an expected-failure probe."""
    prev = getattr(_PROBE_TLS, "quiet", False)
    _PROBE_TLS.quiet = True
    try:
        yield
    finally:
        _PROBE_TLS.quiet = prev

# Runs AFTER the read_*() TVF rewrite (which consumes quoted args), so a
# quoted table ref may legitimately sit right before ')' (subquery close);
# only multi-path lists ('a', 'b') are left untouched.
_PATH_TABLE_RE = re.compile(
    r"(?i)(?P<kw>\b(?:from|join)\s+)'(?P<path>[^']+)'(?!\s*,\s*')"
)
_TVF_RE = re.compile(
    r"(?i)\b(?P<fn>read_parquet|read_csv|read_json|read_xlsx|read_text|"
    r"read_blob)\s*\("
)
_JSON_ARROW_RE = re.compile(
    r"(?P<col>'(?:[^']|'')*'|[A-Za-z_][\w.]*)\s*->>?\s*'(?P<key>[^']+)'"
)
_FORBIDDEN_RE = re.compile(
    r"(?i)^\s*(set|reset|install|load|attach|detach|create\s+secret|copy|"
    r"export|import|begin|commit|rollback|"
    r"checkpoint|vacuum|pragma)\b"
)
# PREPARE/EXECUTE/DEALLOCATE graduated out of the forbidden list in
# round 11: they are query-level session state (like CREATE VIEW /
# CREATE MACRO, both supported), not configuration mutation.
_PREPARE_RE = re.compile(r"(?is)^\s*prepare\s+(\w+)\s+as\s+(.+?)\s*;?\s*$")
_EXECUTE_RE = re.compile(
    r"(?is)^\s*execute\s+(\w+)\s*(?:\((.*)\))?\s*;?\s*$"
)
_DEALLOCATE_RE = re.compile(
    r"(?is)^\s*deallocate\s+(?:prepare\s+)?(\w+)\s*;?\s*$"
)


class SqlRewriter:
    def __init__(
        self,
        spark: SparkSession,
        allowed_dirs: list[str] | None = None,
        allow_remote: bool = True,
    ):
        self.spark = spark
        # DuckDB reads "..." as an identifier, never a string (attached
        # macro bodies arrive double-quoted); runtime-set so externally
        # built sessions get the dialect too.
        spark.conf.set("spark.sql.ansi.doubleQuotedIdentifiers", "true")
        # TIME graduated in round 8: literals parse regardless, but
        # casts/extract need the feature flag (runtime-settable)
        spark.conf.set("spark.sql.timeType.enabled", "true")
        self.allowed_dirs = [os.path.realpath(d) for d in (allowed_dirs or [os.getcwd()])]
        self.allow_remote = allow_remote
        self._views: dict[str, str] = {}
        # geomean ships as a _rewrite_agg_semantics pass (DOUBLE-cast
        # expansion), not an init macro: macros now expand FIRST and
        # shadow built-ins, so an init entry would bypass the pass
        # (pre-round-11 the pass ran before late expansion and the init
        # macro was dead code).
        self._macros: dict[str, tuple[list[str], str]] = {}
        self._table_macros: set[str] = set()
        # PIVOT value-discovery probes, keyed (table_expr, col): the
        # DISTINCT probe is a real Spark job run at REWRITE time, so
        # repeated pivots of the same source paid it per query. Sources
        # here are read-only file views, so session-lifetime caching is
        # sound; a mutated external source would need a new session (or
        # rewriter) to pick up NEW pivot columns — same bind-time flavor
        # as DuckDB's own PIVOT, which fixes the column set per prepare.
        self._pivot_vals: dict[tuple[str, str], list] = {}
        # pivot column names that read like SQL (empty-string pivot
        # values → DuckDB expression-text names): token → literal text,
        # substituted at the rewrite() tail, popped on use. Token names
        # use a monotonic counter (round-10 ADVICE: len()-derived names
        # could collide with a stale key after pops) and the dict is
        # cleared unconditionally at the rewrite() tail.
        self._pivot_name_subs: dict[str, str] = {}
        self._pivot_name_seq = 0
        # PREPARE name AS <stmt> texts, keyed lowercase (round 11)
        self._prepared: dict[str, str] = {}

    def attach_db_file(self, path: str) -> None:
        """Bootstrap tables + macros from a DuckDB file (reference
        --db-file, src/cli/options.rs:183-186)."""
        from .sources.duckdb_catalog import attach_db

        catalog = attach_db(self.spark, path)
        for tm in catalog.table_macros:
            self.add_table_macro(tm)
        for m in catalog.table_macro_defs:
            # a table macro's SELECT body expands to `(body)` — a derived
            # table after FROM/JOIN; same inlining machinery as scalar
            # macros (DuckDB inlines both at bind time).
            self.add_scalar_macro(m.name, m.params, m.body)
        for m in catalog.scalar_macros:
            self.add_scalar_macro(m.name, m.params, m.body)

    # -- sandbox ----------------------------------------------------------

    def check_path(self, path: str) -> None:
        if path.startswith(REMOTE_SCHEMES):
            if not self.allow_remote:
                raise UQueryError.sql_error(f"remote access disabled: {path}")
            return
        real = os.path.realpath(path)
        if not any(real == d or real.startswith(d + os.sep) for d in self.allowed_dirs):
            raise UQueryError.sql_error(
                f"path '{path}' is outside the allowed directories"
            )

    # -- view registration --------------------------------------------------

    def _view_for(self, path: str, fmt: str | None, options: dict[str, str]) -> str:
        key = f"{path}|{fmt}|{sorted(options.items())}"
        view = self._views.get(key)
        if view is None:
            self.check_path(path)
            df = resolve_path(self.spark, path, fmt, options)
            view = "uq_file_" + hashlib.sha1(key.encode()).hexdigest()[:12]
            df.createOrReplaceTempView(view)
            self._views[key] = view
        return view

    # -- rewrites -----------------------------------------------------------

    def _rewrite_path_tables(self, sql: str) -> str:
        def sub(m: re.Match) -> str:
            return m.group("kw") + self._view_for(m.group("path"), None, {})

        return _PATH_TABLE_RE.sub(sub, sql)

    def _rewrite_tvfs(self, sql: str) -> str:
        out: list[str] = []
        pos = 0
        for m in _TVF_RE.finditer(sql):
            args_start = m.end()
            depth, i = 1, args_start
            while i < len(sql) and depth:
                if sql[i] == "(":
                    depth += 1
                elif sql[i] == ")":
                    depth -= 1
                elif sql[i] == "'":  # skip string literal
                    i = sql.index("'", i + 1)
                i += 1
            raw_args = sql[args_start : i - 1]
            fmt = m.group("fn").split("_", 1)[1]
            path, options = self._parse_tvf_args(raw_args)
            out.append(sql[pos : m.start()])
            out.append(self._view_for(path, fmt, options))
            pos = i
        out.append(sql[pos:])
        return "".join(out)

    @staticmethod
    def _parse_tvf_args(raw: str) -> tuple[str, dict[str, str]]:
        parts = [p.strip() for p in re.split(r",(?=(?:[^']*'[^']*')*[^']*$)", raw) if p.strip()]
        if not parts or not parts[0].startswith("'"):
            raise UQueryError.sql_error(f"read_* expects a quoted path, got: {raw[:80]}")
        path = parts[0].strip("'")
        options: dict[str, str] = {}
        for p in parts[1:]:
            if "=" not in p:
                raise UQueryError.sql_error(f"bad read_* option: {p}")
            k, v = p.split("=", 1)
            key = k.strip().rstrip(":").strip()
            options[_OPTION_NAMES.get(key.lower(), key)] = v.strip().strip("'")
        return path, options

    @staticmethod
    def _rewrite_json_arrows(sql: str) -> str:
        def sub(m: re.Match) -> str:
            return f"get_json_object({m.group('col')}, '$.{m.group('key')}')"

        return _JSON_ARROW_RE.sub(sub, sql)

    @staticmethod
    def _scan_top_level(sql: str, keywords: set[str], start: int = 0):
        """Yield (start, end, word) for top-level keywords outside strings."""
        depth, i, n = 0, start, len(sql)
        while i < n:
            c = sql[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "'":
                j = sql.find("'", i + 1)
                i = n if j == -1 else j
            elif depth == 0 and (c.isalpha() or c == "_"):
                j = i
                while j < n and (sql[j].isalnum() or sql[j] == "_"):
                    j += 1
                w = sql[i:j].lower()
                if w in keywords:
                    yield i, j, w
                i = j - 1
            i += 1

    # [relation [alias]] USING SAMPLE <n> [%|PERCENT|ROWS] [(method [, seed])]
    _SAMPLE_RE = re.compile(
        r"(?i)\b(?P<rel>(?!(?:from|join|on|where|select|and|or)\b)[\w.]+)"
        r"(?:\s+(?:as\s+)?(?P<alias>(?!using\b)\w+))?"
        r"\s+using\s+sample\s+(?P<n>\d+(?:\.\d+)?)\s*(?P<unit>%|percent\b|rows\b)?"
        r"(?:\s*\(\s*\w+\s*(?:,\s*(?P<seed>\d+))?\s*\))?"
    )

    @classmethod
    def _rewrite_using_sample(cls, sql: str) -> str:
        """DuckDB ``rel [alias] USING SAMPLE n [%|ROWS] [(method, seed)]``
        → Spark ``rel TABLESAMPLE (n PERCENT|ROWS) [REPEATABLE (seed)]
        [alias]`` — Spark's grammar puts the sample BEFORE the alias, so
        any alias is hoisted past it. Bare ``n`` means rows (DuckDB
        default); the sampling-method name is dropped (Spark picks its
        own), the seed carries over. Applies to named relations (table or
        view refs); subquery sampling should sample inside the subquery.
        """

        def sub(m: re.Match) -> str:
            unit = (m.group("unit") or "rows").lower()
            kind = "PERCENT" if unit in ("%", "percent") else "ROWS"
            rep = f" REPEATABLE ({m.group('seed')})" if m.group("seed") else ""
            alias = f" {m.group('alias')}" if m.group("alias") else ""
            return f"{m.group('rel')} TABLESAMPLE ({m.group('n')} {kind}){rep}{alias}"

        return cls._SAMPLE_RE.sub(sub, sql)

    # -- DuckDB → Spark function renames (1:1 semantics verified against
    # DuckDB: array_position returns 0 when missing in BOTH engines;
    # regexp_like/regexp_matches are both partial-match). list_sort /
    # array_to_string / regexp_replace / regexp_extract need arg-aware
    # rewrites (NULL placement, empty-list, flags) — separate passes below.
    _FN_RENAMES = {
        "list_transform": "transform",
        "list_filter": "filter",
        # list_distinct/array_distinct moved to _rewrite_list_distinct
        # (nested-fuzzer catch r7: DuckDB REMOVES NULLs — [5,NULL,7,NULL]
        # → [7,5] — where Spark's array_distinct keeps one)
        # list_contains/array_contains moved to _rewrite_b20_fns (DuckDB
        # returns false on null-bearing misses where Spark 3VL gives NULL)
        "list_min": "array_min",
        "list_max": "array_max",
        # list_append/list_prepend moved to _rewrite_b20_fns (nested
        # fuzzer catch: Spark's array functions are width-strict where
        # DuckDB coerces numeric element/value types)
        # list_position/list_indexof/array_indexof moved to
        # _rewrite_b20_fns (fuzzer catch: Spark's array_position is
        # width-strict where DuckDB coerces numeric types)
        "from_hex": "unhex",
        # list_zip/array_zip moved to _rewrite_list_zip (round-12
        # wave-11: DuckDB names the struct fields list_1..list_n where
        # arrays_zip uses positional 0/1 — a silent field-name diff —
        # and supports a literal trailing truncate flag)
        "regexp_matches": "regexp_like",
        "strlen": "length",
        # round-5 sweep batch 2 (1:1 semantics verified against DuckDB)
        # arg_max/arg_min/max_by/min_by moved to _rewrite_b28_aggs
        # (agg-fuzzer catch: DuckDB skips NULL-VALUE rows, Spark's
        # max_by can return one)
        "editdist3": "levenshtein",
        "unicode": "ascii",  # both: codepoint of the first character
        "ord": "ascii",
        "json_keys": "json_object_keys",
        # Spark split() is regex-based — these are direct renames, unlike
        # string_split (literal separator, regex-escaped by _SPLIT_CALL_RE)
        "string_split_regex": "split",
        "str_split_regex": "split",
        "strpos": "instr",  # both: 1-based position, 0 when absent
        "approx_quantile": "approx_percentile",  # both sketch-based
        # DuckDB's reservoir sampling is RANDOMIZED run-to-run; Spark's
        # deterministic sketch is the same accept-the-SQL contract
        # (3rd arg: reservoir size ≈ accuracy, both "bigger = better")
        "reservoir_quantile": "approx_percentile",
        "regexp_split_to_array": "split",
        "from_base64": "unbase64",
        "to_base64": "base64",
        "starts_with": "startswith",
        "ends_with": "endswith",
        "prefix": "startswith",
        "suffix": "endswith",
        "gen_random_uuid": "uuid",
        # batch 16: to_hex(255)='FF', to_hex(-1)=16 F's on both engines
        "to_hex": "hex",
        # batch 17
        "list_pack": "array",
        # batch 28: both are the statement-start timestamp
        "transaction_timestamp": "now",
        "list_apply": "transform",
        # batch 18
        "list_value": "array",
        "today": "current_date",
        # DuckDB list()/array_agg KEEP null elements, Spark array_agg
        # drops them — documented deviation (null-free columns identical)
        "list": "array_agg",
        # list_has_any / list_concat moved to _rewrite_list_nulls (NULL
        # semantics differ from the 1:1 Spark functions — ADVICE r5)
        "list_intersect": "array_intersect",
        "array_length": "size",
        # list_element / list_extract moved to _rewrite_list_index (ANSI
        # element_at ERRORS on out-of-bounds; DuckDB returns NULL)
        "row": "struct",
    }
    _FN_RENAME_RE = re.compile(
        r"(?i)\b(" + "|".join(_FN_RENAMES) + r")\s*\(",
    )
    # batch 20: bare `split` IS literal-separator in DuckDB (alias of
    # string_split) while Spark's split() is regex — without the escape,
    # split('a.b', '.') silently explodes per-char. Internal passes that
    # emit Spark regex split() all run after _rewrite_function_names.
    _SPLIT_CALL_RE = re.compile(
        r"(?i)\b(?:string_split|str_split|string_to_array|split)\s*\("
    )
    _REGEX_META = set(".^$*+?()[]{}|\\")

    _MAP_LITERAL_RE = re.compile(r"(?i)\bmap\s*\{")
    _STRING_AGG_RE = re.compile(r"(?i)\bstring_agg\s*\(")

    def _rewrite_map_literal(self, sql: str) -> str:
        """DuckDB ``MAP {'k': v, …}`` → Spark ``map('k', v, …)``
        (balanced-brace scan; keys/values pass through recursively)."""
        m = self._MAP_LITERAL_RE.search(sql)
        while m:
            depth, i, n = 1, m.end(), len(sql)
            while i < n and depth:
                if sql[i] == "'":
                    i = sql.index("'", i + 1)
                depth += {"{": 1, "}": -1}.get(sql[i], 0)
                i += 1
            inner = sql[m.end() : i - 1]
            flat = []
            for entry in self._split_top(inner, ","):
                k, _, v = entry.partition(":")
                flat.append(f"{k.strip()}, {v.strip()}")
            sql = sql[: m.start()] + f"map({', '.join(flat)})" + sql[i:]
            m = self._MAP_LITERAL_RE.search(sql)
        return sql

    _DISTINCT_IN_AGG_RE = re.compile(r"(?i)\(\s*distinct\b")

    def _rewrite_string_agg_order(self, sql: str) -> str:
        """DuckDB ``string_agg(x, sep ORDER BY o)`` → Spark
        ``listagg(x, sep) WITHIN GROUP (ORDER BY o)``; plain string_agg
        (no in-args ORDER BY) is native and left alone.

        Spark 4.1 bug dodge (round-10 agg fuzzer, fresh seed 91001):
        ``ListAgg.withNewChildrenInternal`` throws ClassCastException
        when RewriteDistinctAggregates expands the plan — listagg
        combined with TWO-plus DISTINCT aggregates over different
        expressions crashes at runtime (one DISTINCT works; probed on
        4.1.2). When any ``(DISTINCT`` appears elsewhere in the
        statement and no OVER follows, translate to an exactly
        equivalent comparator-sorted collect_list fold instead of
        listagg (overtriggering is safe — the fold is semantically
        identical and fuzz-validated)."""
        m = self._STRING_AGG_RE.search(sql)
        pos = 0
        while m:
            close = self._find_close(sql, m.end() - 1)
            if close == -1:
                break
            inner = sql[m.end() : close]
            split = re.split(r"(?i)\border\s+by\b", inner, maxsplit=1)
            if len(split) == 2:
                args, order = split[0].rstrip().rstrip(","), split[1].strip()
                rest = sql[: m.start()] + sql[close + 1 :]
                over_follows = re.match(r"\s*over\b", sql[close + 1 :], re.I)
                fold = None
                if self._DISTINCT_IN_AGG_RE.search(rest) and not over_follows:
                    fold = self._string_agg_sorted_fold(args.strip(), order)
                repl = fold or (
                    f"listagg({args.strip()}) WITHIN GROUP (ORDER BY {order})"
                )
                sql = sql[: m.start()] + repl + sql[close + 1 :]
                pos = m.start() + len(repl)
            else:
                pos = m.end()
            m = self._STRING_AGG_RE.search(sql, pos)
        return sql

    def _string_agg_sorted_fold(self, args: str, order: str) -> str | None:
        """Equivalent of ``listagg(x, sep) WITHIN GROUP (ORDER BY …)``
        without the ListAgg operator: collect (value, keys) structs
        (NULL values skipped, like string_agg), array_sort with a
        generated comparator honoring ASC/DESC and NULLS FIRST/LAST
        (DuckDB defaults: ASC, NULLS LAST), join with the separator;
        empty group → NULL. Ties after every user key break by the
        aggregated VALUE ascending: tie order among equal keys is
        scan-order in DuckDB and listagg alike — unspecified under
        parallelism in both engines — so the fold picks the one
        deterministic choice (saggfz fuzz axis catch, round 10).
        Returns None when the form is out of scope (DISTINCT inside
        the call) — caller keeps the listagg path."""
        parts = self._split_top(args, ",")
        x = parts[0].strip()
        if re.match(r"(?i)^distinct\b", x):
            return None
        sep = parts[1].strip() if len(parts) > 1 else "','"
        fields, conds = [], []
        for i, item in enumerate(self._split_top(order, ",")):
            om = re.match(
                r"(?is)^(.*?)(?:\s+(asc|desc))?(?:\s+nulls\s+(first|last))?\s*$",
                item.strip(),
            )
            kexpr = om.group(1).strip()
            desc = (om.group(2) or "asc").lower() == "desc"
            nfirst = (om.group(3) or "last").lower() == "first"
            fields.append(f"({kexpr}) AS uq_k{i}")
            l, r = f"uq_l.uq_k{i}", f"uq_r.uq_k{i}"
            nf, lt = (-1 if nfirst else 1), (1 if desc else -1)
            conds += [
                f"WHEN {l} IS NULL AND {r} IS NOT NULL THEN {nf}",
                f"WHEN {l} IS NOT NULL AND {r} IS NULL THEN {-nf}",
                f"WHEN {l} < {r} THEN {lt}",
                f"WHEN {l} > {r} THEN {-lt}",
            ]
        conds += [
            "WHEN uq_l.uq_v < uq_r.uq_v THEN -1",
            "WHEN uq_l.uq_v > uq_r.uq_v THEN 1",
        ]
        comp = f"(uq_l, uq_r) -> CASE {' '.join(conds)} ELSE 0 END"
        st = f"struct({', '.join(fields)}, ({x}) AS uq_v)"
        cl = f"collect_list(CASE WHEN ({x}) IS NULL THEN NULL ELSE {st} END)"
        return (
            f"(CASE WHEN size({cl}) = 0 THEN CAST(NULL AS STRING) "
            f"ELSE array_join(transform(array_sort({cl}, {comp}), "
            f"uq_e -> uq_e.uq_v), {sep}) END)"
        )

    _STRUCT_PACK_RE = re.compile(r"(?i)\bstruct_pack\s*\(")
    _SERIES_FROM_RE = re.compile(r"(?i)\b(from|join)\s+generate_series\s*\(")

    def _rewrite_struct_pack(self, sql: str) -> str:
        """DuckDB ``struct_pack(k := v, …)`` → Spark
        ``named_struct('k', v, …)`` (balanced arg split; nested calls
        recurse)."""
        m = self._STRUCT_PACK_RE.search(sql)
        while m:
            close = self._find_close(sql, m.end() - 1)
            if close == -1:
                return sql
            args = self._split_top(sql[m.end() : close], ",")
            pairs = []
            for a in args:
                k, _, v = a.partition(":=")
                pairs.append(f"'{k.strip()}', {self._rewrite_struct_pack(v.strip())}")
            sql = sql[: m.start()] + f"named_struct({', '.join(pairs)})" + sql[close + 1 :]
            m = self._STRUCT_PACK_RE.search(sql)
        return sql

    def _rewrite_generate_series(self, sql: str) -> str:
        """``FROM/JOIN generate_series(a, b[, s])`` (table function, one
        row per value, column ``generate_series``) → a lateral-free
        exploded subquery; scalar ``generate_series(...)`` (returns a
        LIST, inclusive bounds — exactly Spark's sequence()) is handled
        by a plain rename."""
        m = self._SERIES_FROM_RE.search(sql)
        while m:
            close = self._find_close(sql, m.end() - 1)
            if close == -1:
                break
            args = sql[m.end() : close]
            sql = (
                sql[: m.start()]
                + f"{m.group(1)} (SELECT explode(sequence({args})) AS generate_series)"
                + sql[close + 1 :]
            )
            m = self._SERIES_FROM_RE.search(sql)
        sql = re.sub(r"(?i)\bgenerate_series\s*\(", "sequence(", sql)
        # batch 22: an INTERVAL step makes DuckDB's result TIMESTAMP even
        # for DATE bounds; Spark's sequence keeps DATE elements — cast
        # the bounds so the element type (and its string form) matches
        hit = self._call_args(re.compile(r"(?i)\bsequence\s*\("), sql)
        pos = 0
        while hit:
            m, close, args = hit
            if len(args) == 3 and re.match(
                r"(?i)^\s*(interval\b|make_interval|make_dt_interval|make_ym_interval)",
                args[2],
            ):
                repl = (
                    f"sequence(CAST(({args[0]}) AS TIMESTAMP), "
                    f"CAST(({args[1]}) AS TIMESTAMP), {args[2]})"
                )
                sql = sql[: m.start()] + repl + sql[close + 1 :]
                pos = m.start() + len(repl)
            else:
                pos = m.end()
            hit = self._call_args(re.compile(r"(?i)\bsequence\s*\("), sql, pos)
        return sql

    def _rewrite_function_names(self, sql: str) -> str:
        """Rename DuckDB functions to their Spark equivalents, skipping
        string literals. string_split/str_split get special handling:
        DuckDB splits on a LITERAL separator while Spark's split() takes a
        regex, so literal separators are metachar-escaped; non-literal
        separators pass through un-escaped (documented caveat)."""
        out: list[str] = []
        i, n = 0, len(sql)
        while i < n:
            c = sql[i]
            if c == "'":
                j = sql.find("'", i + 1)
                j = n if j == -1 else j + 1
                out.append(sql[i:j])
                i = j
                continue
            m = self._SPLIT_CALL_RE.match(sql, i)
            if m:
                close = self._find_close(sql, m.end() - 1)
                if close != -1:
                    args = self._split_top(sql[m.end() : close], ",")
                    if len(args) == 2:
                        sep = args[1].strip()
                        if sep.startswith("'") and sep.endswith("'"):
                            body = sep[1:-1]
                            esc = "".join(
                                ("\\\\" + ch if ch in self._REGEX_META else ch) for ch in body
                            )
                            inner = self._rewrite_function_names(args[0])
                            out.append(f"split({inner}, '{esc}')")
                            i = close + 1
                            continue
                    out.append("split(")
                    i = m.end()
                    continue
            m = self._FN_RENAME_RE.match(sql, i)
            if m:
                out.append(self._FN_RENAMES[m.group(1).lower()] + "(")
                i = m.end()
                continue
            out.append(c)
            i += 1
        return "".join(out)

    # -- string-literal escape space -------------------------------------
    # DuckDB standard literals are escape-free (a backslash is a literal
    # character); Spark's parser processes backslash escapes (default
    # spark.sql.parser.escapedStringLiterals=false), so '\w+' would reach
    # the regex engine as 'w+'. Normalizing FIRST doubles user backslashes;
    # every later pass that injects its own literal text writes it in
    # Spark escape space (string_split's metachar escaping already does).

    @staticmethod
    def _normalize_literals(sql: str) -> str:
        """Double backslashes inside user string literals so the string
        Spark parses equals the one DuckDB parses. `''` quote-doubling is
        valid in both parsers and passes through. DuckDB `E'...'` escape
        literals are DECODED here (incl. \\xHH, octal, \\uXXXX — escapes
        Spark's parser would mangle into literal chars) and re-emitted in
        Spark escape space."""
        out: list[str] = []
        i, n = 0, len(sql)
        while i < n:
            c = sql[i]
            if c == "'":
                head = "".join(out)
                is_e = head[-1:] in ("E", "e") and not (
                    len(head) > 1 and (head[-2].isalnum() or head[-2] == "_")
                )
                j = i + 1
                while j < n:
                    # E-literals additionally escape with backslash
                    # (PostgreSQL lexing): E'it\'s' must not close at \'.
                    if is_e and sql[j] == "\\":
                        j += 2
                        continue
                    if sql[j] == "'":
                        if j + 1 < n and sql[j + 1] == "'":
                            j += 2
                            continue
                        break
                    j += 1
                if is_e:
                    out[-1] = out[-1][:-1]  # drop the E prefix
                    out.append(SqlRewriter._lit_emit(SqlRewriter._e_decode(sql[i + 1 : j])))
                else:
                    out.append("'" + sql[i + 1 : j].replace("\\", "\\\\") + "'")
                i = j + 1
                continue
            if c == "$":
                # batch-23: dollar-quoted strings $$…$$ / $tag$…$tag$
                # (escape-free in DuckDB) → standard Spark-space literal
                dm = re.match(r"\$(\w*)\$", sql[i:])
                if dm:
                    closer = dm.group(0)
                    end = sql.find(closer, i + len(closer))
                    if end != -1:
                        raw = sql[i + len(closer) : end]
                        out.append(SqlRewriter._lit_emit(raw))
                        i = end + len(closer)
                        continue
            out.append(c)
            i += 1
        return "".join(out)

    _LIT_RE = re.compile(r"'(?:[^']|'')*'", re.S)

    @classmethod
    def _lit_parse(cls, lit: str) -> str | None:
        """Spark-escape-space literal token → the raw string value, or
        None if the token isn't a single plain literal."""
        if not cls._LIT_RE.fullmatch(lit):
            return None
        inner = lit[1:-1]
        out: list[str] = []
        i, n = 0, len(inner)
        while i < n:
            c = inner[i]
            if c == "\\" and i + 1 < n:  # Spark: unknown escape → the char
                out.append(inner[i + 1])
                i += 2
                continue
            if c == "'" and i + 1 < n and inner[i + 1] == "'":
                out.append("'")
                i += 2
                continue
            out.append(c)
            i += 1
        return "".join(out)

    @staticmethod
    def _lit_emit(raw: str) -> str:
        """Raw string value → Spark-escape-space literal token."""
        return "'" + raw.replace("\\", "\\\\").replace("'", "''") + "'"

    _E_SIMPLE = {"b": "\b", "f": "\f", "n": "\n", "r": "\r", "t": "\t",
                 "\\": "\\", "'": "'"}

    @classmethod
    def _e_decode(cls, body: str) -> str:
        r"""Decode a DuckDB/PostgreSQL E'...' literal body to its raw
        value: \b \f \n \r \t \\ \', \xH{1,2}, \o{1,3} octal, \uXXXX,
        \UXXXXXXXX, plus '' quote-doubling. Unknown escapes drop the
        backslash and keep the char (PostgreSQL semantics, verified
        against DuckDB 1.x incl. malformed \xZ; malformed \u, which
        DuckDB rejects at parse time, stays lenient here)."""
        out: list[str] = []
        i, n = 0, len(body)
        while i < n:
            c = body[i]
            if c == "'" and i + 1 < n and body[i + 1] == "'":
                out.append("'")
                i += 2
                continue
            if c != "\\" or i + 1 >= n:
                out.append(c)
                i += 1
                continue
            e = body[i + 1]
            if e in cls._E_SIMPLE:
                out.append(cls._E_SIMPLE[e])
                i += 2
            elif e in "xX":
                j = i + 2
                while j < n and j < i + 4 and body[j] in "0123456789abcdefABCDEF":
                    j += 1
                if j > i + 2:
                    out.append(chr(int(body[i + 2 : j], 16)))
                    i = j
                else:
                    out.append(e)
                    i += 2
            elif e in "01234567":
                j = i + 1
                while j < n and j < i + 4 and body[j] in "01234567":
                    j += 1
                out.append(chr(int(body[i + 1 : j], 8)))
                i = j
            elif e in "uU":
                width = 4 if e == "u" else 8
                hexs = body[i + 2 : i + 2 + width]
                if len(hexs) == width and all(h in "0123456789abcdefABCDEF" for h in hexs):
                    out.append(chr(int(hexs, 16)))
                    i += 2 + width
                else:
                    out.append(e)
                    i += 2
            else:
                out.append(e)  # unknown escape: backslash dropped (PG rules)
                i += 2
        return "".join(out)

    @staticmethod
    def _in_literal(sql: str, idx: int) -> bool:
        """True when sql[idx] sits inside a single-quoted literal (''
        doubling toggles twice and cancels) — i.e. an odd number of
        quotes precede it. str.count runs the scan in C: the Python
        char loop this replaces was O(idx) of interpreter time per call
        and turned the many-probe passes quadratic on large rewritten
        SQL (measured 9 s of a 40 s information_schema rewrite)."""
        return sql.count("'", 0, idx) % 2 == 1

    @classmethod
    def _search_code(cls, pattern: "re.Pattern[str]", sql: str, pos: int = 0):
        """pattern.search skipping matches inside string literals."""
        m = pattern.search(sql, pos)
        while m and cls._in_literal(sql, m.start()):
            m = pattern.search(sql, m.end())
        return m

    @classmethod
    def _sub_code(cls, pattern: "re.Pattern[str]", repl: str, sql: str) -> str:
        """Plain-text substitution skipping string literals."""
        pos = 0
        while True:
            m = cls._search_code(pattern, sql, pos)
            if not m:
                return sql
            sql = sql[: m.start()] + repl + sql[m.end() :]
            pos = m.start() + len(repl)

    # -- regexp_replace / regexp_extract argument semantics ---------------

    _REGEXP_REPLACE_RE = re.compile(r"(?i)\bregexp_replace\s*\(")
    _REGEXP_EXTRACT_RE = re.compile(r"(?i)\bregexp_extract(_all)?\s*\(")

    @staticmethod
    def _java_replacement(raw: str, shift: int) -> str:
        """RE2 replacement string → Java: ``\\k`` backrefs become
        ``$(k+shift)``, literal ``$`` and ``\\`` get Java-escaped."""
        out: list[str] = []
        i, n = 0, len(raw)
        while i < n:
            c = raw[i]
            if c == "\\" and i + 1 < n and raw[i + 1].isdigit():
                out.append(f"${int(raw[i + 1]) + shift}")
                i += 2
                continue
            if c == "\\" and i + 1 < n and raw[i + 1] == "\\":
                out.append("\\\\")
                i += 2
                continue
            if c == "$":
                out.append("\\$")
                i += 1
                continue
            if c == "\\":
                out.append("\\\\")
                i += 1
                continue
            out.append(c)
            i += 1
        return "".join(out)

    def _translate_regexp_replace(self, args: list[str]) -> str:
        """One regexp_replace call, args already recursed. DuckDB replaces
        the FIRST match unless flagged 'g', accepts an RE2 flag string, and
        uses \\1 backrefs; Spark always replaces all, has no flag arg, and
        uses $1. Verified vs DuckDB: first-only/no-match/empty-match/
        newline-prefix cases, 'i'/'gi' flags, \\0 whole-match refs, literal
        '$' in replacements."""
        fallback = f"regexp_replace({', '.join(args)})"
        if len(args) not in (3, 4):
            return fallback
        flags = ""
        if len(args) == 4:
            f = self._lit_parse(args[3])
            if f is None or not set(f) <= set("gism"):
                return fallback  # unknown/non-literal flags: pass through
            flags = f
        inline = "".join(ch for ch in "ism" if ch in flags)
        prefix = f"(?{inline})" if inline else ""
        s, pat_lit, repl_lit = args[0], args[1], args[2]
        pat = self._lit_parse(pat_lit)
        repl = self._lit_parse(repl_lit)
        if "g" in flags:
            if repl is not None:
                repl_lit = self._lit_emit(self._java_replacement(repl, 0))
            if pat is not None:
                pat_lit = self._lit_emit(prefix + pat)
            elif prefix:
                pat_lit = f"concat('{prefix}', {pat_lit})"
            return f"regexp_replace({s}, {pat_lit}, {repl_lit})"
        if repl is None:
            return fallback  # can't shift unknown backrefs: replace-all deviation
        repl_lit = self._lit_emit("$1" + self._java_replacement(repl, 2))
        if pat is not None:
            pat_lit = self._lit_emit(f"^((?s:.*?))({prefix}{pat})")
        else:
            pat_lit = f"concat('^((?s:.*?))({prefix}', {pat_lit}, ')')"
        return f"regexp_replace({s}, {pat_lit}, {repl_lit})"

    _REGEXP_MATCHES_RE = re.compile(r"(?i)\bregexp_matches\s*\(")

    def _rewrite_regexp_matches_flags(self, sql: str) -> str:
        """3-arg regexp_matches(s, pat, options) — the 2-arg form renames
        1:1 to regexp_like, but Spark's regexp_like has no options arg
        (round-11 wave-6 probe: the 3-arg form was a loud wrong-arity
        error). DuckDB 1.0.0-probed semantics: options apply LAST-WINS
        for 'c'/'i' (matches('abc','B','ci') = true, 'ic' = false);
        'l' is literal partial match ('a.c' matches 'a.c' not 'abc');
        's' is dotall (default dot does NOT cross newlines); 'g' is an
        ERROR ("only valid for regexp_replace"). Translation: 'l' →
        contains() (optionally case-folded — no \\Q\\E fragility);
        otherwise inline (?i)/(?s) prefixes. Murky newline options
        m/n/p and non-literal flag strings stay untranslated (loud
        arity error, never a silent wrong value)."""
        pos = 0
        while True:
            hit = self._call_args(self._REGEXP_MATCHES_RE, sql, pos)
            if not hit:
                return sql
            m, close, args = hit
            if len(args) != 3:
                pos = m.end()
                continue
            f = self._lit_parse(args[2])
            if f is None:
                pos = m.end()
                continue
            if "g" in f:
                raise UQueryError.sql_error(
                    "Option 'g' (global replace) is only valid for regexp_replace"
                )
            if not set(f) <= set("cisl"):
                pos = m.end()
                continue
            s, pat = args[0], args[1]
            ci = next((ch for ch in reversed(f) if ch in "ci"), "c") == "i"
            if "l" in f:
                if ci:
                    repl = f"contains(lower(({s})), lower(({pat})))"
                else:
                    repl = f"contains(({s}), ({pat}))"
            else:
                prefix = ("(?i)" if ci else "") + ("(?s)" if "s" in f else "")
                p_lit = self._lit_parse(pat)
                if not prefix:
                    pat_expr = pat
                elif p_lit is not None:
                    pat_expr = self._lit_emit(prefix + p_lit)
                else:
                    pat_expr = f"concat('{prefix}', {pat})"
                repl = f"regexp_like(({s}), {pat_expr})"
            sql = sql[: m.start()] + repl + sql[close + 1 :]
            pos = m.start() + len(repl)

    def _rewrite_regexp_replace(self, sql: str) -> str:
        """DuckDB regexp_replace(s, pat, repl[, flags]) → Spark (see
        _translate_regexp_replace). Recurses into arguments and the tail
        so nested calls translate exactly once."""
        m = self._search_code(self._REGEXP_REPLACE_RE, sql)
        if not m:
            return sql
        close = self._find_close(sql, m.end() - 1)
        if close == -1:
            return sql
        args = [
            self._rewrite_regexp_replace(a.strip())
            for a in self._split_top(sql[m.end() : close], ",")
        ]
        tail = self._rewrite_regexp_replace(sql[close + 1 :])
        return sql[: m.start()] + self._translate_regexp_replace(args) + tail

    def _rewrite_regexp_extract(self, sql: str) -> str:
        """Two-arg regexp_extract[_all](s, pat) returns the WHOLE match in
        DuckDB (group 0) but group 1 in Spark — pin the default with an
        explicit 0. Calls with an explicit group pass through (same
        numbering in both engines)."""
        out: list[str] = []
        pos = 0
        m = self._search_code(self._REGEXP_EXTRACT_RE, sql, pos)
        while m:
            close = self._find_close(sql, m.end() - 1)
            if close == -1:
                break
            inner = self._rewrite_regexp_extract(sql[m.end() : close])
            parts = self._split_top(inner, ",")
            if len(parts) == 2:
                inner += ", 0"
            elif (
                len(parts) == 3
                and not m.group(1)  # regexp_extract only (not _all)
                and re.match(r"(?i)^\s*array\s*\(", parts[2].strip())
            ):
                # batch 28: named-group LIST form returns a STRUCT —
                # regexp_extract(s, pat, ['a','b']) = {'a': g1, 'b': g2}
                # (unmatched optional groups are '' on both engines)
                am = re.match(r"(?i)^\s*array\s*\(", parts[2].strip())
                names_body = parts[2].strip()[am.end() : -1]
                names = [
                    self._lit_parse(n.strip())
                    for n in self._split_top(names_body, ",")
                ]
                if any(n is None for n in names):
                    raise UQueryError.sql_error(
                        "regexp_extract: group names must be string literals"
                    )
                s_arg, p_arg = parts[0].strip(), parts[1].strip()
                fields = ", ".join(
                    f"'{n}', regexp_extract({s_arg}, {p_arg}, {i + 1})"
                    for i, n in enumerate(names)
                )
                out.append(sql[pos : m.start()] + f"named_struct({fields})")
                pos = close + 1
                m = self._search_code(self._REGEXP_EXTRACT_RE, sql, pos)
                continue
            out.append(sql[pos : m.end()] + inner + ")")
            pos = close + 1
            m = self._search_code(self._REGEXP_EXTRACT_RE, sql, pos)
        out.append(sql[pos:])
        return "".join(out)

    # -- list_sort / array_to_string argument semantics -------------------

    _LIST_SORT_RE = re.compile(r"(?i)\blist_(reverse_)?sort\s*\(")
    _ARRAY_TO_STRING_RE = re.compile(r"(?i)\barray_to_string\s*\(")

    def _rewrite_list_sort(self, sql: str) -> str:
        """DuckDB list_sort(l[, 'ASC'|'DESC'[, 'NULLS FIRST'|'NULLS LAST']])
        and list_reverse_sort(l[, null_order]) → the Spark call with the
        same NULL placement (verified vs DuckDB: NULLs sort LAST in every
        default): ASC→array_sort (nulls last), ASC+NULLS FIRST→sort_array,
        DESC→sort_array(l, false) (nulls last), DESC+NULLS FIRST→
        reverse(array_sort). The old plain rename to sort_array put NULLs
        first ascending and rejected the string direction argument."""
        m = self._search_code(self._LIST_SORT_RE, sql)
        if not m:
            return sql
        close = self._find_close(sql, m.end() - 1)
        if close == -1:
            return sql
        args = [
            self._rewrite_list_sort(a.strip())
            for a in self._split_top(sql[m.end() : close], ",")
        ]
        tail = self._rewrite_list_sort(sql[close + 1 :])
        l = args[0]
        mods = [(self._lit_parse(a) or "").upper() for a in args[1:]]
        if m.group(1):  # list_reverse_sort: direction fixed DESC
            desc, nulls_first = True, "NULLS FIRST" in mods
        else:
            desc = "DESC" in mods
            nulls_first = "NULLS FIRST" in mods
        if desc:
            call = f"reverse(array_sort({l}))" if nulls_first else f"sort_array({l}, false)"
        else:
            call = f"sort_array({l})" if nulls_first else f"array_sort({l})"
        return sql[: m.start()] + call + tail

    def _rewrite_array_to_string(self, sql: str) -> str:
        """array_to_string(l, sep) → array_join guarded for lists with
        no NON-NULL elements: DuckDB yields NULL for [] AND for [NULL]
        (verified batch 16), Spark's array_join yields ''. NULL
        elements are skipped by both when any non-null remains."""
        m = self._search_code(self._ARRAY_TO_STRING_RE, sql)
        if not m:
            return sql
        close = self._find_close(sql, m.end() - 1)
        if close == -1:
            return sql
        args = [
            self._rewrite_array_to_string(a.strip())
            for a in self._split_top(sql[m.end() : close], ",")
        ]
        tail = self._rewrite_array_to_string(sql[close + 1 :])
        if len(args) != 2:
            return sql[: m.start()] + f"array_join({', '.join(args)})" + tail
        l, sep = args
        # cast elements to STRING: DuckDB stringifies non-VARCHAR lists
        # (array_to_string([1,2], '-') = '1-2'); Spark's array_join
        # rejects non-string arrays (batch-8 sweep)
        le = f"transform(({l}), uq_a2s -> CAST(uq_a2s AS STRING))"
        call = (
            f"CASE WHEN size(filter(({l}), uq_ae -> uq_ae IS NOT NULL)) = 0 "
            f"THEN NULL ELSE array_join({le}, {sep}) END"
        )
        return sql[: m.start()] + call + tail

    # -- round-5 dialect gap-hunt closures (list_aggregate / list_reduce /
    # list_slice / scalar range / format / 3-arg date_diff / bare struct
    # literal) — each found by running common DuckDB idioms through the
    # gateway side-by-side with DuckDB itself. ------------------------------

    _LIST_AGG_RE = re.compile(r"(?i)\blist_(?:aggregate|aggr)\s*\(")
    _LIST_REDUCE_RE = re.compile(r"(?i)\b(?:list|array)_reduce\s*\(")
    _LIST_SLICE_RE = re.compile(r"(?i)\blist_slice\s*\(")
    _RANGE_CALL_RE = re.compile(r"(?i)(?<![\w.])range\s*\(")
    _FORMAT_RE = re.compile(r"(?i)\bformat\s*\(")
    # lookahead, not consumption, for the leading quote: _call_args needs
    # the match to END at '(' for the paren-balance scan.
    _DATE_DIFF3_RE = re.compile(r"(?i)\b(?:date_diff|datediff)\s*\((?=\s*')")
    _STRUCT_LIT_RE = re.compile(r"(?<![\w'}])\{\s*'")

    def _call_args(self, regex, sql, pos=0):
        """(match, close_idx, [args]) for the next non-literal call."""
        m = self._search_code(regex, sql, pos)
        if not m:
            return None
        close = self._find_close(sql, m.end() - 1)
        if close == -1:
            return None
        return m, close, [a.strip() for a in self._split_top(sql[m.end() : close], ",")]

    _LIST_AGG_ALIAS_RE = re.compile(
        r"(?i)\blist_(sem|entropy|stddev_samp|stddev_pop|var_samp|var_pop|"
        r"product|skewness|kurtosis|string_agg|mad)\s*\("
    )

    def _rewrite_list_agg_aliases(self, sql: str) -> str:
        """Standalone ``list_<aggregate>`` sugar (round-11 wave-9:
        list_sem/list_product/… were loud UNRESOLVED_ROUTINE) →
        the ``list_aggregate(x, '<fn>')`` spelling the pass below
        translates. Both spellings are DuckDB-equivalent (probed)."""
        pos = 0
        while True:
            hit = self._call_args(self._LIST_AGG_ALIAS_RE, sql, pos)
            if not hit:
                return sql
            m, close, args = hit
            if len(args) != 1:
                # advance past the NAME only, not the whole call —
                # nested rewritable occurrences inside the unmatched
                # call's arguments must still be scanned (ADVICE r12)
                pos = m.end()
                continue
            repl = f"list_aggregate({args[0]}, '{m.group(1).lower()}')"
            sql = sql[: m.start()] + repl + sql[close + 1 :]
            pos = m.start() + len(repl)

    def _rewrite_list_aggregate(self, sql: str) -> str:
        """list_aggregate/list_aggr(l, 'fname') for the common fnames:
        min/max → array_min/max; count → size of non-null filter (BIGINT
        like DuckDB); sum → higher-order fold seeded with first-elem*0
        so the accumulator keeps the ELEMENT type; avg → sum/count in
        DOUBLE. NULL elements are skipped like DuckDB. Unsupported
        fnames raise rather than mistranslate."""
        hit = self._call_args(self._LIST_AGG_RE, sql)
        if not hit:
            return sql
        m, close, args = hit
        tail = self._rewrite_list_aggregate(sql[close + 1 :])
        if len(args) != 2:
            raise UQueryError.sql_error("list_aggregate expects (list, 'function')")
        l = self._rewrite_list_aggregate(args[0])
        fname = (self._lit_parse(args[1]) or "").lower()
        nn = f"filter(({l}), x -> x IS NOT NULL)"
        # element-typed fold; DECIMAL elements widen per step which
        # Spark's aggregate() rejects (fold-stable type required —
        # fuzzer catch, batch 28) → uq_poly falls back to a DOUBLE
        # fold (documented width deviation, same values)
        sum_expr = (
            f"uq_poly("
            f"aggregate(transform({nn}, uq_dv -> CAST(uq_dv AS DOUBLE)), "
            f"CAST(0 AS DOUBLE), (a, x) -> a + x), "
            f"aggregate({nn}, try_element_at({nn}, 1) * 0, (a, x) -> a + x))"
        )
        count_expr = f"CAST(size({nn}) AS BIGINT)"
        # avg accumulates in DOUBLE from the start (a decimal-element
        # fold can't widen its own accumulator type mid-aggregate)
        avg_sum = (
            f"aggregate({nn}, CAST(try_element_at({nn}, 1) * 0 AS DOUBLE), (a, x) -> a + x)"
        )
        # Round-11 wave-9: the statistics family (list_sem/list_stddev_
        # samp/…/list_aggregate(x, 'skewness')) — independent O(n)
        # moment folds (s1..s4) instead of a mean-inside-the-lambda
        # form (the r7 lambda-invariant O(n²) trap); try_divide gives
        # DuckDB's NULLs at the probed small-n boundaries (var_samp
        # n=1, skewness n≤2 or constant input, kurtosis n≤3, sem n=0 —
        # but sem n=1 is 0.0). Corrected sample estimators mirror the
        # aggregate-level skewness/kurtosis translations.
        dd = f"transform({nn}, uq_dv -> CAST(uq_dv AS DOUBLE))"
        n_d = f"CAST(size({nn}) AS DOUBLE)"
        s1 = f"aggregate({dd}, CAST(0 AS DOUBLE), (a, x) -> a + x)"
        s2 = f"aggregate({dd}, CAST(0 AS DOUBLE), (a, x) -> a + x * x)"
        s3 = f"aggregate({dd}, CAST(0 AS DOUBLE), (a, x) -> a + x * x * x)"
        s4 = f"aggregate({dd}, CAST(0 AS DOUBLE), (a, x) -> a + x * x * x * x)"
        var_pop = (
            f"try_divide(greatest(({s2}) - try_divide(({s1}) * ({s1}), {n_d}),"
            f" CAST(0 AS DOUBLE)), {n_d})"
        )
        var_samp = (
            f"try_divide(greatest(({s2}) - try_divide(({s1}) * ({s1}), {n_d}),"
            f" CAST(0 AS DOUBLE)), {n_d} - 1)"
        )
        mu = f"try_divide(({s1}), {n_d})"
        m2 = f"(try_divide(({s2}), {n_d}) - ({mu}) * ({mu}))"
        m3 = (
            f"(try_divide(({s3}), {n_d}) - 3 * ({mu}) * try_divide(({s2}), {n_d})"
            f" + 2 * pow(({mu}), 3))"
        )
        m4 = (
            f"(try_divide(({s4}), {n_d}) - 4 * ({mu}) * try_divide(({s3}), {n_d})"
            f" + 6 * pow(({mu}), 2) * try_divide(({s2}), {n_d})"
            f" - 3 * pow(({mu}), 4))"
        )
        g1 = f"try_divide(({m3}), pow(greatest(({m2}), CAST(0 AS DOUBLE)), 1.5))"
        skew = (
            f"try_divide(({g1}) * sqrt({n_d} * ({n_d} - 1)), {n_d} - 2)"
        )
        kpe = f"(try_divide(({m4}), pow(({m2}), 2)) - 3)"
        kurt = (
            f"(try_divide({n_d} - 1, ({n_d} - 2) * ({n_d} - 3)) * "
            f"(({n_d} + 1) * ({kpe}) + 6))"
        )
        ent_freqs = (
            f"transform(array_distinct({nn}), uq_ev -> "
            f"CAST(size(filter({nn}, uq_e -> uq_e = uq_ev)) AS DOUBLE))"
        )
        ent = (
            f"(CASE WHEN size({nn}) = 0 THEN CAST(0 AS DOUBLE) ELSE "
            f"-aggregate({ent_freqs}, CAST(0 AS DOUBLE), (a, c) -> "
            f"a + (c / {n_d}) * log2(c / {n_d})) END + 0)"
        )
        med_s = self._median_of("uq_ls")
        mad_devs = "array_sort(transform(uq_ls, uq_mv -> abs(uq_mv - uq_lm)))"
        mad = (
            f"(CASE WHEN size({nn}) = 0 THEN NULL ELSE "
            f"aggregate(array(0), array_sort({dd}), (uq_a1, uq_i1) -> uq_a1, "
            f"uq_ls -> aggregate(array(0), ({med_s}), (uq_a2, uq_i2) -> uq_a2, "
            f"uq_lm -> ({self._median_of(mad_devs)}))) END)"
        )
        # Plain concatenation, NOT str.format: nn embeds user SQL text,
        # and a brace inside a string literal there (e.g.
        # list_product(split('x{y', ','))) made .format raise an
        # uncaught ValueError → 500 instead of the 400 contract (ADVICE
        # r12).
        def empty_null(e: str) -> str:
            return f"CASE WHEN size({nn}) = 0 THEN NULL ELSE {e} END"
        exprs = {
            "min": f"array_min(({l}))",
            "max": f"array_max(({l}))",
            "sum": sum_expr,
            "count": count_expr,
            "avg": f"({avg_sum} / {count_expr})",
            "mean": f"({avg_sum} / {count_expr})",
            "var_pop": var_pop,
            "var_samp": var_samp,
            "variance": var_samp,
            "stddev_pop": f"sqrt({var_pop})",
            "stddev_samp": f"sqrt({var_samp})",
            "stddev": f"sqrt({var_samp})",
            # sem = stddev_pop / sqrt(n): n=1 → 0.0, n=0 → NULL (probed)
            "sem": f"try_divide(sqrt({var_pop}), sqrt({n_d}))",
            "skewness": skew,
            "kurtosis": kurt,
            "product": empty_null(
                f"aggregate({dd}, CAST(1 AS DOUBLE), (a, x) -> a * x)"
            ),
            "entropy": ent,
            "string_agg": (
                f"array_join(transform({nn}, uq_sv -> "
                f"CAST(uq_sv AS STRING)), ',')"
            ),
            "mad": mad,
        }
        if fname not in exprs:
            raise UQueryError.sql_error(
                f"list_aggregate: unsupported function '{fname}' "
                f"(supported: {sorted(exprs)})"
            )
        return sql[: m.start()] + exprs[fname] + tail

    _LAM3_RE = re.compile(
        r"^\(\s*(\w+)\s*,\s*(\w+)\s*,\s*(\w+)\s*\)\s*->\s*(.*)$", re.S
    )

    def _rewrite_list_reduce(self, sql: str) -> str:
        """list_reduce(l, (a, b) -> …) folds from the FIRST element with
        no initial value → Spark reduce() over the tail seeded with
        element 1 (empty list yields NULL where DuckDB errors —
        documented lenient deviation; lambda syntax is identical).

        Batch 16: the (a, b, i) form — i is the 1-based ITERATION
        counter (DuckDB-verified: list_reduce([1,2,3], (a,b,i) ->
        a+b*i) = 9, so i=1 when b is element 2) → the tail is zipped
        with sequence(1, n-1) into structs and the body's b/i
        references rebind to the struct fields (lambda params shadow
        outer names, so whole-word substitution outside literals is
        exact). Single-element lists skip the fold (zip_with pads with
        NULLs otherwise)."""
        hit = self._call_args(self._LIST_REDUCE_RE, sql)
        if not hit:
            return sql
        m, close, args = hit
        tail = self._rewrite_list_reduce(sql[close + 1 :])
        if len(args) != 2:
            raise UQueryError.sql_error("list_reduce expects (list, lambda)")
        l = self._rewrite_list_reduce(args[0])
        lam = args[1]
        m3 = self._LAM3_RE.match(lam)
        if m3:
            acc, elem, idx, body = m3.groups()
            for name, repl_f in ((elem, "uq_zs.uq_ze"), (idx, "uq_zs.uq_zi")):
                word = re.compile(rf"\b{re.escape(name)}\b")
                out, pos2 = [], 0
                while True:
                    wm = self._search_code(word, body, pos2)
                    if not wm:
                        break
                    out.append(body[pos2 : wm.start()])
                    out.append(repl_f)
                    pos2 = wm.end()
                out.append(body[pos2:])
                body = "".join(out)
            zipped = (
                f"zip_with(slice(({l}), 2, size(({l})) - 1), "
                f"sequence(1, size(({l})) - 1), "
                f"(uq_ze, uq_zi) -> struct(uq_ze AS uq_ze, uq_zi AS uq_zi))"
            )
            repl = (
                f"(CASE WHEN size(({l})) <= 1 THEN try_element_at(({l}), 1) "
                f"ELSE aggregate({zipped}, try_element_at(({l}), 1), "
                f"({acc}, uq_zs) -> ({body})) END)"
            )
        else:
            repl = (
                f"reduce(slice(({l}), 2, greatest(size(({l})) - 1, 0)), "
                f"try_element_at(({l}), 1), {lam})"
            )
        return sql[: m.start()] + repl + tail

    def _rewrite_list_slice(self, sql: str) -> str:
        """list_slice(l, a, b) — 1-based INCLUSIVE bounds → slice(l, a,
        b - a + 1). Positive indices only (negatives are served by the
        bracket syntax l[a:b], which handles them). The 4-arg STEP form
        (r13 wave-15 — previously a loud wrong-arity error) delegates
        to the bracket form l[a:b:s] via _rewrite_array_slice_fn
        (which runs BEFORE the bracket pass), inheriting its
        negative-step and index handling; DuckDB itself rejects
        string+step, so the string-polymorphic path there is
        permissive-only."""
        hit = self._call_args(self._LIST_SLICE_RE, sql)
        if not hit:
            return sql
        m, close, args = hit
        tail = self._rewrite_list_slice(sql[close + 1 :])
        if len(args) != 3:
            raise UQueryError.sql_error(
                "list_slice expects (list, begin, end[, step])"
            )
        l, a, b = (self._rewrite_list_slice(x) for x in args)
        return (
            sql[: m.start()]
            + f"slice(({l}), ({a}), ({b}) - ({a}) + 1)"
            + tail
        )

    @staticmethod
    def _range_seq_sql(a: str, b: str, s: str) -> str:
        """DuckDB range(): start inclusive, stop EXCLUSIVE, empty when
        the step doesn't move toward stop — vs Spark sequence()'s
        inclusive stop and auto-negative step. Integer semantics."""
        empty = "slice(array(CAST(0 AS BIGINT)), 1, 0)"
        return (
            f"CASE WHEN ({s}) > 0 AND ({a}) < ({b}) "
            f"THEN sequence(CAST(({a}) AS BIGINT), CAST(({b}) AS BIGINT) - 1, CAST(({s}) AS BIGINT)) "
            f"WHEN ({s}) < 0 AND ({a}) > ({b}) "
            f"THEN sequence(CAST(({a}) AS BIGINT), CAST(({b}) AS BIGINT) + 1, CAST(({s}) AS BIGINT)) "
            f"ELSE {empty} END"
        )

    def _rewrite_range_calls(self, sql: str) -> str:
        """Scalar/FROM-position range(…) → guarded sequence() (exclusive
        stop, direction-checked step). FROM range(n) exposes the DuckDB
        column name ``range``."""
        pos = 0
        while True:
            hit = self._call_args(self._RANGE_CALL_RE, sql, pos)
            if not hit:
                return sql
            m, close, args = hit
            # window frames (`RANGE BETWEEN …`) have no '(' right after
            # RANGE, so any match here is the function form.
            if len(args) == 1:
                a, b, s = "0", args[0], "1"
            elif len(args) == 2:
                a, b, s = args[0], args[1], "1"
            elif len(args) == 3:
                a, b, s = args
            else:
                pos = m.end()
                continue
            if re.search(r"(?i)\binterval\b", s):
                # temporal range (batch-13): DuckDB's stop stays EXCLUSIVE
                # and the result is TIMESTAMP even for DATE bounds;
                # sequence() is inclusive → drop a stop-equal last element.
                # Positive-interval steps only (the DuckDB-common form).
                bt = f"CAST(({b}) AS TIMESTAMP)"
                seq = (
                    f"filter(sequence(CAST(({a}) AS TIMESTAMP), {bt}, ({s})), "
                    f"uq_rg -> uq_rg <> {bt})"
                )
            else:
                seq = self._range_seq_sql(a, b, s)
            head = sql[: m.start()]
            if re.search(r"(?is)\b(from|join)\s*$", head):
                repl = f"(SELECT explode({seq}) AS range)"
            else:
                repl = seq
            sql = head + repl + sql[close + 1 :]
            pos = m.start() + len(repl)

    _FMT_SPEC_RE = re.compile(
        r"^(?:(?P<fill>.)?(?P<align>[<>^]))?(?P<sign>[+ ]?)(?P<alt>#?)"
        r"(?P<zero>0?)(?P<width>\d*)(?P<comma>,?)(?:\.(?P<prec>\d+))?"
        r"(?P<typ>[a-zA-Z%]?)$"
    )

    def _fmt_spec_to_pct(self, body: str):
        """fmt format-spec → (java %-spec-sans-%, cast_type, wrap) —
        batch 28 extended the plain-{} translation to the spec
        mini-language. Raises on forms where C++ fmt and Java's
        Formatter disagree (center align, %g, custom fills, {:%}) —
        translate-or-raise, never mistranslate."""
        sm = self._FMT_SPEC_RE.match(body)
        if not sm:
            raise UQueryError.sql_error(
                f"format(): unsupported placeholder '{{:{body}}}'"
            )
        fill, align = sm.group("fill"), sm.group("align")
        sign, alt, zero = sm.group("sign"), sm.group("alt"), sm.group("zero")
        width, comma, prec = sm.group("width"), sm.group("comma"), sm.group("prec")
        typ = sm.group("typ")
        if fill not in (None, "", " ") or align == "^":
            raise UQueryError.sql_error(
                "format(): custom fills and center alignment are not supported"
            )
        if typ in ("g", "G", "%"):
            raise UQueryError.sql_error(
                f"format(): '{typ}' — C++ fmt and Java formatting disagree"
            )
        flags = ("-" if align == "<" else "") + sign + alt + zero + (comma or "")
        cast, wrap = None, None
        if typ in ("d",):
            cast = "BIGINT"
        elif typ in ("x", "X", "o"):
            cast = "BIGINT"
        elif typ in ("f", "F", "e", "E"):
            cast = "DOUBLE"
        elif typ == "b":
            # Java %b is boolean — binary renders via conv(); width
            # handled by the %s width, zero-padding via lpad
            wrap = "lower(conv(CAST(({a}) AS BIGINT), 10, 2))"
            if zero and width:
                wrap = f"lpad({wrap}, {int(width)}, '0')"
                width, flags = "", flags.replace("0", "")
            typ = "s"
        elif typ == "" and comma:
            # {:,} — grouping implies a numeric: fmt's int default
            typ, cast = "d", "BIGINT"
        elif typ in ("s", ""):
            if typ == "" and width and not align:
                raise UQueryError.sql_error(
                    "format(): width without a type or alignment is "
                    "ambiguous (fmt aligns strings left, numbers right) — "
                    "add '<'/'>' or a type"
                )
            if typ == "" and align:
                # {:>6} renders via Java %s which stringifies numbers
                # differently from C++ fmt ('1.0' vs '1') — only a
                # provably-string argument may pass through (sentinel
                # validated per-argument in consume())
                cast = "UQ_REQUIRE_STRING"
            typ = "s"
        else:
            raise UQueryError.sql_error(
                f"format(): unsupported type '{typ}'"
            )
        prec_s = f".{prec}" if prec is not None else ""
        return f"{flags}{width}{prec_s}{typ}", cast, wrap

    def _rewrite_format(self, sql: str) -> str:
        """format('…{}…', args) (fmt.format-style braces) →
        format_string: `{}` → `%s`, `{k}` → positional, `{{`/`}}` →
        literal braces, and (batch 28) the format-spec mini-language
        ({:.2f}, {:>6}, {:06.1f}, {:x}, {:,}, {:+.1f}, {:o}, {:e},
        {:b} via conv) with spec-driven argument casts. Only literal
        format strings translate; fmt/Java disagreements raise."""
        hit = self._call_args(self._FORMAT_RE, sql)
        if not hit:
            return sql
        m, close, args = hit
        tail = self._rewrite_format(sql[close + 1 :])
        fmt = self._lit_parse(args[0]) if args else None
        if fmt is None:
            raise UQueryError.sql_error("format() requires a literal format string")
        # recurse into value args: a NESTED format() stayed untranslated
        # (round-10 self-nesting sweep — same class as list_distinct)
        vals = [self._rewrite_format(a) for a in args[1:]]
        casts: dict[int, str] = {}
        wraps: dict[int, str] = {}

        _STRY_RE = re.compile(
            r"(?is)^\s*(?:uq_poly\s*\(\s*)?"
            r"(?:upper|lower|trim|ltrim|rtrim|btrim|concat|concat_ws"
            r"|substr|substring|left|right|repeat|reverse|lpad|rpad|replace"
            r"|format_string|printf|regexp_replace|translate|chr|typeof)\s*\("
        )
        _STRCAST_RE = re.compile(
            r"(?is)^\s*(?:try_)?cast\s*\(.*\bas\s+(?:string|varchar|text|char)\b"
        )
        # upper/lower arrive as the batch-28 ASCII-guard CASE hybrid
        _STRHYBRID_RE = re.compile(
            r"(?is)^\s*\(?\s*case\s+when\b.*\buq_(?:upper|lower)_simple\s*\("
        )
        # bare (possibly qualified / quoted) column reference
        _BAREID_RE = re.compile(
            r'(?s)^\s*(?:[A-Za-z_]\w*|"[^"]+"|`[^`]+`)'
            r'(?:\.(?:[A-Za-z_]\w*|"[^"]+"|`[^`]+`))*\s*$'
        )

        def consume(k: int, cast, wrap):
            if k >= len(vals):
                raise UQueryError.sql_error(
                    "format(): more placeholders than arguments"
                )
            if cast == "UQ_REQUIRE_STRING":
                v = vals[k]
                if (
                    self._lit_parse(v.strip()) is None
                    and not _STRY_RE.match(v)
                    and not _STRCAST_RE.match(v)
                    and not _STRHYBRID_RE.match(v)
                ):
                    if _BAREID_RE.match(v):
                        # ADVICE r7: a plain column reference — Java %s
                        # and fmt agree exactly for STRING inputs, so
                        # accept it behind a runtime type dispatch
                        # (typeof is constant per column); a non-string
                        # column raises at execution instead of
                        # silently diverging ('1.0' vs fmt's '1').
                        wraps[k] = (
                            "(CASE WHEN typeof({a}) = 'string' THEN {a} "
                            "ELSE raise_error(CONCAT('format(): aligned "
                            "placeholder without a type requires a string "
                            "argument, got ', typeof({a}), ' — add an "
                            "explicit type or CAST(x AS STRING)')) END)"
                        )
                        return
                    raise UQueryError.sql_error(
                        "format(): aligned placeholder without a type "
                        "renders via Java %s, which stringifies numbers "
                        "differently from C++ fmt ('1.0' vs '1') — add an "
                        "explicit type, CAST(x AS STRING), or pass a "
                        "string expression"
                    )
                cast = None
            if cast:
                if casts.get(k, cast) != cast:
                    raise UQueryError.sql_error(
                        "format(): conflicting specs for one argument"
                    )
                casts[k] = cast
            if wrap:
                if k in wraps and wraps[k] != wrap:
                    raise UQueryError.sql_error(
                        "format(): conflicting specs for one argument"
                    )
                wraps[k] = wrap

        out, i, n = [], 0, len(fmt)
        auto = 0
        while i < n:
            c = fmt[i]
            if c == "{":
                if fmt[i : i + 2] == "{{":
                    out.append("{")
                    i += 2
                    continue
                j = fmt.find("}", i)
                if j == -1:
                    raise UQueryError.sql_error("format(): unbalanced '{' in format string")
                spec = fmt[i + 1 : j]
                argnum, _, body = spec.partition(":")
                if ":" not in spec:
                    argnum, body = spec, ""
                if body:
                    pct, cast, wrap = self._fmt_spec_to_pct(body)
                else:
                    pct, cast, wrap = "s", None, None
                if argnum == "":
                    consume(auto, cast, wrap)
                    out.append(f"%{pct}")
                    auto += 1
                elif argnum.isdigit():
                    consume(int(argnum), cast, wrap)
                    out.append(f"%{int(argnum) + 1}${pct}")
                else:
                    raise UQueryError.sql_error(
                        f"format(): unsupported placeholder '{{{spec}}}'"
                    )
                i = j + 1
            elif fmt[i : i + 2] == "}}":
                out.append("}")
                i += 2
            elif c == "%":
                out.append("%%")
                i += 1
            else:
                out.append(c)
                i += 1
        lit = "'" + "".join(out).replace("'", "''") + "'"
        final_args = []
        for k, v in enumerate(vals):
            if k in wraps:
                final_args.append(wraps[k].format(a=v))
            elif k in casts:
                final_args.append(f"CAST(({v}) AS {casts[k]})")
            else:
                final_args.append(v)
        rest = "".join(f", {a}" for a in final_args)
        return sql[: m.start()] + f"format_string({lit}{rest})" + tail

    _DATE_DIFF_UNITS = {
        "day": "CAST(datediff(CAST(({b}) AS DATE), CAST(({a}) AS DATE)) AS BIGINT)",
        "week": (
            "CAST(datediff(date_trunc('WEEK', ({b})), date_trunc('WEEK', ({a}))) div 7 AS BIGINT)"
        ),
        "month": (
            "CAST((year(({b})) * 12 + month(({b}))) - (year(({a})) * 12 + month(({a}))) AS BIGINT)"
        ),
        "quarter": (
            "CAST((year(({b})) * 4 + quarter(({b}))) - (year(({a})) * 4 + quarter(({a}))) AS BIGINT)"
        ),
        "year": "CAST(year(({b})) - year(({a})) AS BIGINT)",
        "hour": (
            "CAST((unix_timestamp(date_trunc('HOUR', CAST(({b}) AS TIMESTAMP))) - "
            "unix_timestamp(date_trunc('HOUR', CAST(({a}) AS TIMESTAMP)))) div 3600 AS BIGINT)"
        ),
        "minute": (
            "CAST((unix_timestamp(date_trunc('MINUTE', CAST(({b}) AS TIMESTAMP))) - "
            "unix_timestamp(date_trunc('MINUTE', CAST(({a}) AS TIMESTAMP)))) div 60 AS BIGINT)"
        ),
        "second": (
            "CAST(unix_timestamp(CAST(({b}) AS TIMESTAMP)) - "
            "unix_timestamp(CAST(({a}) AS TIMESTAMP)) AS BIGINT)"
        ),
    }

    def _rewrite_date_diff(self, sql: str) -> str:
        """DuckDB 3-arg date_diff('unit', a, b) counts unit-BOUNDARY
        crossings; Spark's date_diff/timestampdiff count COMPLETE units
        (Jan 31 → Feb 1 is month-diff 1 in DuckDB, 0 in Spark). Each
        unit maps to explicit truncate-then-diff arithmetic. 2-arg
        Spark-style datediff has no leading string literal and is left
        untouched."""
        hit = self._call_args(self._DATE_DIFF3_RE, sql)
        if not hit:
            return sql
        m, close, args = hit
        tail = self._rewrite_date_diff(sql[close + 1 :])
        if len(args) != 3:
            raise UQueryError.sql_error("date_diff('unit', start, end) expects 3 args")
        unit = (self._lit_parse(args[0]) or "").lower().rstrip("s")
        unit = {"min": "minute", "sec": "second", "mon": "month", "yr": "year"}.get(unit, unit)
        template = self._DATE_DIFF_UNITS.get(unit)
        if template is None:
            raise UQueryError.sql_error(
                f"date_diff: unsupported unit '{unit}' "
                f"(supported: {sorted(self._DATE_DIFF_UNITS)})"
            )
        a, b = self._rewrite_date_diff(args[1]), self._rewrite_date_diff(args[2])
        return sql[: m.start()] + template.format(a=a, b=b) + tail

    def _rewrite_struct_literal(self, sql: str) -> str:
        """Bare DuckDB struct literal ``{'k': v, …}`` → named_struct
        ('k', v, …). Runs AFTER _rewrite_map_literal so ``MAP {…}`` has
        already been consumed; a brace starting with a quoted key is
        unambiguous in SQL text."""
        m = self._search_code(self._STRUCT_LIT_RE, sql)
        while m:
            # scan from just after the '{' itself — m.end() sits past the
            # OPENING quote of the first key, which desyncs quote-skipping
            depth, i, n = 1, m.start() + 1, len(sql)
            while i < n and depth:
                if sql[i] == "'":
                    i = sql.find("'", i + 1)
                    if i == -1:
                        raise UQueryError.sql_error(
                            "struct literal: unterminated string literal"
                        )
                depth += {"{": 1, "}": -1}.get(sql[i], 0)
                i += 1
            if depth:
                raise UQueryError.sql_error("struct literal: unbalanced '{'")
            inner = sql[m.start() + 1 : i - 1]
            flat = []
            for entry in self._split_top(inner, ","):
                k, _, v = entry.partition(":")
                flat.append(f"{k.strip()}, {self._rewrite_struct_literal(v.strip())}")
            sql = sql[: m.start()] + f"named_struct({', '.join(flat)})" + sql[i:]
            m = self._search_code(self._STRUCT_LIT_RE, sql)
        return sql

    # -- sweep batch 2: datetime epochs / names, quantiles, product,
    # time_bucket ---------------------------------------------------------

    _DAYNAME_RE = re.compile(r"(?i)\b(day|month)name\s*\(")
    _EPOCH_RE = re.compile(r"(?i)\bepoch(_ms|_us|_ns)?\s*\(")
    _QUANTILE_RE = re.compile(r"(?i)\bquantile(_cont|_disc)?\s*\(")
    _PRODUCT_RE = re.compile(r"(?i)\bproduct\s*\(")
    _TIME_BUCKET_RE = re.compile(r"(?i)\btime_bucket\s*\(")
    _INTERVAL_LIT_RE = re.compile(r"(?i)^\s*interval\s+'?(\d+)'?\s+(\w+?)s?\s*$")
    _BUCKET_MS = {"second": 1000, "minute": 60_000, "hour": 3_600_000, "day": 86_400_000}

    def _rewrite_dayname(self, sql: str) -> str:
        """dayname/monthname → date_format full names (Spark's own
        dayname() returns the ABBREVIATED name — 'Mon' vs 'Monday')."""
        hit = self._call_args(self._DAYNAME_RE, sql)
        if not hit:
            return sql
        m, close, args = hit
        tail = self._rewrite_dayname(sql[close + 1 :])
        fmt = "EEEE" if m.group(1).lower() == "day" else "MMMM"
        inner = self._rewrite_dayname(args[0]) if args else ""
        return sql[: m.start()] + f"date_format(({inner}), '{fmt}')" + tail

    def _rewrite_epoch(self, sql: str) -> str:
        """epoch(ts) → fractional seconds as DOUBLE (DuckDB keeps the
        microsecond fraction — bare unix_timestamp truncates); epoch_ms /
        epoch_us → unix_millis / unix_micros (BIGINT in both engines).

        Batch 17: epoch_ms is POLYMORPHIC in DuckDB — with a BIGINT
        argument it CONSTRUCTS a timestamp from epoch-milliseconds
        (the old timestamp-only reading silently returned the µs count
        instead — the sweep's worst class). Emitted as a uq_poly
        marker: the late LIMIT-0 probe picks timestamp_millis(x) iff
        the argument is integral (Spark's timestamp_millis rejects
        STRING and TIMESTAMP outright, so the dispatch is unambiguous),
        else the extraction form."""
        hit = self._call_args(self._EPOCH_RE, sql)
        if not hit:
            return sql
        m, close, args = hit
        tail = self._rewrite_epoch(sql[close + 1 :])
        x = self._rewrite_epoch(args[0]) if args else ""
        ts = f"CAST(({x}) AS TIMESTAMP)"
        suffix = (m.group(1) or "").lower()
        # round 8: epoch(TIME) = seconds since midnight — the TIME type
        # admits no TIMESTAMP cast, so that operand class rides a
        # '1970-01-01 ' string prefix (probe-dispatched; fraction
        # survives via the canonical TIME string form)
        t_ts = (
            f"CAST(CONCAT('1970-01-01 ', CAST(({x}) AS STRING)) AS TIMESTAMP)"
        )
        repl = {
            # marker semantics: uq_poly(fallback, preferred) — the
            # SECOND arm wins when it analyzes, so the native timestamp
            # form sits second and the TIME detour first
            "": (
                f"uq_poly(CAST(unix_micros({t_ts}) / 1000000.0 AS DOUBLE), "
                f"CAST(unix_micros({ts}) / 1000000.0 AS DOUBLE))"
            ),
            "_ms": f"uq_poly(unix_millis({ts}), timestamp_millis(({x})))",
            "_us": f"unix_micros({ts})",
            "_ns": f"(unix_micros({ts}) * 1000)",
        }[suffix]
        return sql[: m.start()] + repl + tail

    _IGN_NULLS_FN_RE = re.compile(
        r"(?i)\b(first_value|last_value|nth_value|lead|lag|any_value)\s*\("
    )
    _IGN_NULLS_TAIL_RE = re.compile(r"(?i)\b(ignore|respect)\s+nulls\s*$")

    def _rewrite_ignore_nulls_arg(self, sql: str) -> str:
        """DuckDB puts IGNORE/RESPECT NULLS INSIDE the call's argument
        list — first_value(v IGNORE NULLS), nth_value(v, 2 IGNORE
        NULLS) — and rejects the postfix placement; Spark is exactly
        the opposite (round-11 wave-7 probe: every arg-internal form
        was a loud parse error). Relocate the keyword outside the
        closing paren; argument text is otherwise untouched."""
        pos = 0
        while True:
            hit = self._call_args(self._IGN_NULLS_FN_RE, sql, pos)
            if not hit:
                return sql
            m, close, args = hit
            tm = self._IGN_NULLS_TAIL_RE.search(args[-1])
            if not tm:
                # advance past the name, not the call: an arg-internal
                # IGNORE NULLS nested inside another candidate call
                # (lead(coalesce(v, first_value(x IGNORE NULLS))))
                # must still be found (ADVICE r12)
                pos = m.end()
                continue
            args[-1] = args[-1][: tm.start()].rstrip()
            repl = (
                m.group(0)
                + ", ".join(args)
                + f") {tm.group(1).upper()} NULLS"
            )
            sql = sql[: m.start()] + repl + sql[close + 1 :]
            pos = m.start() + len(repl)

    @staticmethod
    def _ordered_spec(over: str | None) -> bool:
        """True when a window spec carries ORDER BY or an explicit
        frame — the shapes Spark's percentile/median window rejects
        (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC)."""
        return bool(
            over
            and re.search(r"(?i)\border\s+by\b|\brows\b|\brange\b|\bgroups\b", over)
        )

    _MEDIAN_RE = re.compile(r"(?i)\bmedian\s*\(")

    def _rewrite_ordered_window_percentiles(self, sql: str) -> str:
        """median / quantile_cont / quantile_disc / quantile OVER an
        ORDER BY (or framed) window — DuckDB computes running
        percentiles; Spark's percentile family rejects the spec
        outright (round-11 wave-7 probe: loud
        INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC). Translation: ONE
        collect_list over the same spec, array_sort, then the
        DuckDB-probed index rules — median interpolates ((lo+hi)/2 on
        even counts), quantile_cont at idx = q·(n−1) interpolating
        between floor/ceil neighbours (probed: quantile_cont(0.25) on
        [10,20,30,40] = 17.5), quantile_disc at floor(q·(n−1))+1
        (probed 0.5 → lower of two). FILTER folds into the collected
        argument (NULLs vanish from collect_list exactly like DuckDB's
        NULL-skipping percentiles). Values compute in DOUBLE — the
        same documented width/decimal-discreteness deviation as the
        aggregate median path; non-numeric args fail loudly at the
        `* 1.0` guard rather than silently casting. Partition-only
        specs fall through to the native/WITHIN GROUP paths below."""
        for regex, kind in (
            (self._MEDIAN_RE, "median"),
            (self._QUANTILE_RE, "quantile"),
        ):
            pos = 0
            while True:
                hit = self._call_args(regex, sql, pos)
                if not hit:
                    break
                m, close, args = hit
                filt, over, endpos = self._nested_agg_over(sql, close, kind)
                if not self._ordered_spec(over):
                    pos = m.end()
                    continue
                if re.match(r"(?i)^\s*distinct\b", args[0]):
                    raise UQueryError.sql_error(
                        "quantile/median with DISTINCT is not supported"
                    )
                x = args[0]
                if filt is not None:
                    x = f"CASE WHEN {filt} THEN ({x}) END"
                if kind == "median":
                    if len(args) != 1:
                        raise UQueryError.sql_error("median expects 1 argument")
                    q = None
                else:
                    if len(args) != 2:
                        raise UQueryError.sql_error(
                            "quantile*: only the (expr, scalar_quantile) form is supported"
                        )
                    q = args[1]
                cl = (
                    f"array_sort(collect_list(CAST((({x}) * 1.0) AS DOUBLE)) "
                    f"OVER {over})"
                )
                if kind == "median":
                    body = self._median_of("uq_qw")
                elif (m.group(1) or "_disc").lower() == "_cont":
                    idx = f"(({q}) * (size(uq_qw) - 1))"
                    lo = f"CAST(floor({idx}) AS INT)"
                    body = (
                        f"CASE WHEN {idx} = floor({idx}) "
                        f"THEN try_element_at(uq_qw, {lo} + 1) "
                        f"ELSE try_element_at(uq_qw, {lo} + 1) "
                        f"+ (try_element_at(uq_qw, {lo} + 2) "
                        f"- try_element_at(uq_qw, {lo} + 1)) "
                        f"* ({idx} - floor({idx})) END"
                    )
                else:
                    # disc rule: smallest index i with i/n >= q, i.e.
                    # max(1, ceil(q*n)) — probed on seven (n, q) pairs
                    # incl. the n=3, q=0.75 case that falsified a
                    # floor(q*(n-1))+1 draft
                    body = (
                        f"try_element_at(uq_qw, greatest(1, "
                        f"CAST(ceil(({q}) * size(uq_qw)) AS INT)))"
                    )
                # LET-bind the sorted list once (the r7 lambda-invariant
                # lesson): zero and finish lambdas each evaluate once.
                repl = (
                    f"(aggregate(array(0), {cl}, (uq_qa, uq_qi) -> uq_qa, "
                    f"uq_qw -> CASE WHEN size(uq_qw) = 0 THEN NULL "
                    f"ELSE ({body}) END))"
                )
                sql = sql[: m.start()] + repl + sql[endpos + 1 :]
                pos = m.start() + len(repl)
        return sql

    def _rewrite_quantile(self, sql: str) -> str:
        """quantile_cont/quantile_disc/quantile(x, q) → Spark's ordered-
        set percentile_cont/percentile_disc (bare quantile is DISC in
        DuckDB). List-of-quantiles forms are not translated (array
        result would violate the scalar-column convention anyway)."""
        hit = self._call_args(self._QUANTILE_RE, sql)
        if not hit:
            return sql
        m, close, args = hit
        tail = self._rewrite_quantile(sql[close + 1 :])
        if len(args) != 2:
            raise UQueryError.sql_error(
                "quantile*: only the (expr, scalar_quantile) form is supported"
            )
        kind = (m.group(1) or "_disc").lower()
        if re.match(r"(?i)^\s*distinct\b", args[0]):
            # translate-or-raise (round 8): WITHIN GROUP admits no
            # DISTINCT in Spark, and DuckDB's own median/quantile
            # DISTINCT semantics are surprising (probed: median
            # DISTINCT appears to ignore the qualifier) — raise rather
            # than ship a garbled ORDER BY (DISTINCT x) to Catalyst
            raise UQueryError.sql_error(
                "quantile/median with DISTINCT is not supported"
            )
        x = self._rewrite_quantile(args[0])
        fn = "percentile_cont" if kind == "_cont" else "percentile_disc"
        return (
            sql[: m.start()]
            + f"{fn}({args[1]}) WITHIN GROUP (ORDER BY ({x}))"
            + tail
        )

    def _rewrite_product(self, sql: str) -> str:
        """product(x) aggregate → sequential double fold over ONE
        collect_list (Spark has no product aggregate; DOUBLE result
        like DuckDB). The original exp(sum(ln|x|)) form carried ~1e-15
        RELATIVE error — exact-valued integer products past ~1e6 broke
        the 9-decimal compare (round-9 agg fuzzer, seed 2026:
        762048 vs 762047.9999999984) — and returned +0.0 where DuckDB's
        sequential multiply gives -0.0 for a zero with an odd negative
        count. The fold is bit-exact for integer products < 2^53 and
        reproduces the signed zero. NULLs skip via collect_list;
        empty/all-NULL → NULL; FILTER CASE-folds; OVER rides the
        collect.

        Memory bound (round-10 ADVICE, documented trade): collect_list
        makes per-group memory O(group size) — unlike the constant-
        memory exp(sum(ln|x|)) form this replaced, a pathological
        single-group product over billions of rows pressures one
        executor. Exactness won: product() is a reporting aggregate
        over grouped data in every reference/test workload, and the
        log-space form returned visibly wrong integers (round-9
        fuzzer). The list is array_sort-ed before the fold so float
        products are deterministic run-to-run (collection order varies
        with partitioning; the sign and integer-exact results are
        order-independent, so sorting cannot change them)."""
        hit = self._call_args(self._PRODUCT_RE, sql)
        if not hit:
            return sql
        m, close, args = hit
        filt, over, endpos = self._nested_agg_over(sql, close, "product")
        osuf = f" OVER {over}" if over else ""
        tail = self._rewrite_product(sql[endpos + 1 :])
        x = self._rewrite_product(args[0]) if args else ""
        if filt is not None:
            x = f"CASE WHEN {filt} THEN ({x}) END"
        cl = f"array_sort(collect_list(CAST(({x}) AS DOUBLE)){osuf})"
        repl = (
            f"(CASE WHEN size({cl}) = 0 THEN CAST(NULL AS DOUBLE) "
            f"ELSE aggregate({cl}, CAST(1 AS DOUBLE), "
            f"(uq_pa, uq_px) -> uq_pa * uq_px) END)"
        )
        return sql[: m.start()] + repl + tail

    def _rewrite_time_bucket(self, sql: str) -> str:
        """time_bucket(INTERVAL n unit, ts) → epoch-aligned floor
        (timestamp_millis of unix_millis div width). Sub-week units only:
        they are origin-independent, while DuckDB aligns week+ buckets to
        2000-01-03 — raise rather than mis-bucket those."""
        hit = self._call_args(self._TIME_BUCKET_RE, sql)
        if not hit:
            return sql
        m, close, args = hit
        tail = self._rewrite_time_bucket(sql[close + 1 :])
        if len(args) != 2:
            raise UQueryError.sql_error("time_bucket expects (INTERVAL, ts)")
        im = self._INTERVAL_LIT_RE.match(args[0])
        unit_ms = im and self._BUCKET_MS.get(im.group(2).lower())
        if not unit_ms:
            raise UQueryError.sql_error(
                f"time_bucket: unsupported width '{args[0]}' "
                "(literal INTERVAL n second/minute/hour/day only)"
            )
        w = int(im.group(1)) * unit_ms
        ts = f"CAST(({self._rewrite_time_bucket(args[1])}) AS TIMESTAMP)"
        repl = f"timestamp_millis((unix_millis({ts}) div {w}) * {w})"
        return sql[: m.start()] + repl + tail

    # -- sweep batch 4: JSON extraction, ISO-week datetimes, interval
    # constructors --------------------------------------------------------

    _JSON_EXTRACT_RE = re.compile(r"(?i)\bjson_extract(_string|_path_text)?\s*\(")
    _JSON_VALID_RE = re.compile(r"(?i)\bjson_valid\s*\(")
    _ISO_DT_RE = re.compile(
        r"(?i)\b(isodow|yearweek|century|week|decade|millennium)\s*\("
    )
    _TO_INTERVAL_RE = re.compile(
        r"(?i)\bto_(years|months|weeks|days|hours|minutes|seconds"
        r"|milliseconds|microseconds|decades|centuries|millennia|quarters)\s*\("
    )
    _MAKE_INTERVAL_SLOT = {
        "years": 0, "months": 1, "weeks": 2, "days": 3,
        "hours": 4, "minutes": 5, "seconds": 6,
    }

    def _rewrite_json_extract(self, sql: str) -> str:
        """json_extract(j, p) → to_json(variant_get(parse_json(j), p)) —
        EXACT DuckDB semantics incl. JSON string quoting ('"x"' for
        strings, bare 7 for numbers); json_extract_string /
        json_extract_path_text → get_json_object (raw text). A literal
        JSONPointer path ('/a/b') converts to $-path."""
        hit = self._call_args(self._JSON_EXTRACT_RE, sql)
        if not hit:
            return sql
        m, close, args = hit
        tail = self._rewrite_json_extract(sql[close + 1 :])
        if len(args) != 2:
            raise UQueryError.sql_error("json_extract expects (json, path)")
        j = self._rewrite_json_extract(args[0])
        p = args[1]
        # round 11 (wave-8): a LIST of paths returns a LIST of
        # extractions ([$.a, $.b] → ['1', '2'] — DuckDB-probed). The
        # bracket pass has usually rewritten the literal to array(…)
        # by now; accept both spellings.
        plist = re.match(r"^\s*\[(.*)\]\s*$", p, re.S) or re.match(
            r"(?i)^\s*array\s*\((.*)\)\s*$", p, re.S
        )
        fe_udf = "uq_json_extract_fe_str" if m.group(1) else "uq_json_extract_fe"

        def _fe_path(expr: str) -> bool:
            el = self._lit_parse(expr)
            if el is not None and "[#-" in el:
                from .functions.parity_udfs import register_parity_udfs

                register_parity_udfs(self.spark)
                return True
            return False

        if plist:
            elems = self._split_top(plist.group(1), ",")
            fn = "get_json_object(({j}), {p})" if m.group(1) else \
                "nullif(to_json(variant_get(parse_json(({j})), {p})), 'null')"
            parts = ", ".join(
                f"{fe_udf}(CAST(({j}) AS STRING), {e.strip()})"
                if _fe_path(e.strip())
                else fn.format(j=j, p=e.strip())
                for e in elems
                if e.strip()
            )
            return sql[: m.start()] + f"array({parts})" + tail
        lit = self._lit_parse(p)
        if lit is not None and lit.startswith("/"):
            # JSONPointer '/a/b' → JSONPath '$.a.b' (object keys only)
            p = "'$" + ".".join(lit.split("/")).rstrip(".") + "'"
        if _fe_path(p):
            # DuckDB [#-n] from-end index (round 12 — was a documented
            # loud error): Spark's path engines reject it → exact-
            # semantics UDF walk (uq_json_extract_fe; probed: [#-0] is
            # the FIRST element, out-of-range and JSON null → NULL)
            repl = f"{fe_udf}(CAST(({j}) AS STRING), {p})"
        elif m.group(1):  # _string / _path_text: raw text extraction
            repl = f"get_json_object(({j}), {p})"
        else:
            # nullif: a JSON null VALUE extracts to SQL NULL like DuckDB
            # (probed IS NULL = true; round 12 — the bare to_json
            # rendered 'null' text, a silent wrong value; a JSON STRING
            # "null" renders quoted, so it is untouched)
            repl = f"nullif(to_json(variant_get(parse_json(({j})), {p})), 'null')"
        return sql[: m.start()] + repl + tail

    _JSON_ARR_LEN_RE = re.compile(r"(?i)\bjson_array_length\s*\(")

    def _rewrite_json_array_length(self, sql: str) -> str:
        """json_array_length, both arities, DuckDB-probed semantics the
        jsonfz axis caught Spark's builtin silently missing (round 12):
        a VALID non-array document (or a found non-array path) counts
        as 0 — Spark returns NULL; malformed JSON ERRORS (Spark: NULL)
        — parse_json() in the guard restores the loud error; SQL NULL
        and a missing/json-null path stay NULL. 2-arg counts the array
        AT the path (round-11 wave-8); a [#-n] from-end path routes
        through the UDF walk like json_extract."""
        pos = 0
        while True:
            hit = self._call_args(self._JSON_ARR_LEN_RE, sql, pos)
            if not hit:
                return sql
            m, close, args = hit
            if len(args) not in (1, 2) or not args[0].strip():
                pos = m.end()
                continue
            # recurse into the argument FIRST — the replacement embeds
            # the arg text verbatim and the scan skips past it, so a
            # nested json_array_length inside would otherwise survive
            # untranslated (the round-12 skip-path class, other side)
            j = self._rewrite_json_array_length(args[0])
            # NB: `parse_json(j) IS NULL` would NOT restore the loud
            # malformed error — parse_json is null-intolerant, so the
            # optimizer collapses the IsNull to `j IS NULL` without
            # ever parsing; a >= comparison over its length survives
            # optimization and forces the parse (raising like DuckDB).
            parse_0 = f"IF(length(to_json(parse_json(({j})))) >= 0, 0, 0)"
            if len(args) == 1:
                repl = (
                    f"(CASE WHEN ({j}) IS NULL THEN CAST(NULL AS INT) "
                    f"ELSE coalesce(json_array_length(({j})), {parse_0}) END)"
                )
            else:
                plit = self._lit_parse(args[1].strip())
                if plit is not None and "[#-" in plit:
                    from .functions.parity_udfs import register_parity_udfs

                    register_parity_udfs(self.spark)
                    inner = f"uq_json_extract_fe(CAST(({j}) AS STRING), {args[1]})"
                else:
                    inner = f"get_json_object(({j}), {args[1]})"
                repl = (
                    f"(CASE WHEN ({j}) IS NULL THEN CAST(NULL AS INT) "
                    f"WHEN ({inner}) IS NULL THEN nullif({parse_0}, 0) "
                    f"ELSE coalesce(json_array_length({inner}), {parse_0}) END)"
                )
            sql = sql[: m.start()] + repl + sql[close + 1 :]
            pos = m.start() + len(repl)

    def _rewrite_json_valid(self, sql: str) -> str:
        hit = self._call_args(self._JSON_VALID_RE, sql)
        if not hit:
            return sql
        m, close, args = hit
        tail = self._rewrite_json_valid(sql[close + 1 :])
        j = self._rewrite_json_valid(args[0]) if args else ""
        return sql[: m.start()] + f"(try_parse_json(({j})) IS NOT NULL)" + tail

    def _rewrite_iso_datetime(self, sql: str) -> str:
        """ISO-week family: isodow (Mon=1..Sun=7), week (ISO week),
        yearweek (ISO year*100 + week), century — each as explicit
        arithmetic over Spark's dayofweek/weekofyear/YEAROFWEEK."""
        hit = self._call_args(self._ISO_DT_RE, sql)
        if not hit:
            return sql
        m, close, args = hit
        tail = self._rewrite_iso_datetime(sql[close + 1 :])
        x = self._rewrite_iso_datetime(args[0]) if args else ""
        d = f"CAST(({x}) AS DATE)"
        fn = m.group(1).lower()
        repl = {
            "isodow": f"CAST(pmod(dayofweek({d}) + 5, 7) + 1 AS BIGINT)",
            "week": f"CAST(weekofyear({d}) AS BIGINT)",
            "yearweek": (
                f"CAST(extract(YEAROFWEEK FROM {d}) * 100 + weekofyear({d}) AS BIGINT)"
            ),
            "century": f"CAST(ceil(year({d}) / 100.0) AS BIGINT)",
            # batch 17: decade = floor(year/10); millennium counts like
            # century (1994 -> 2, 2000 -> 2, 2001 -> 3 — verified)
            "decade": f"CAST(floor(year({d}) / 10.0) AS BIGINT)",
            "millennium": f"CAST(ceil(year({d}) / 1000.0) AS BIGINT)",
        }[fn]
        return sql[: m.start()] + repl + tail

    def _rewrite_to_interval(self, sql: str) -> str:
        """to_days/to_hours/… interval constructors → make_interval with
        the value in the matching slot; sub-second units scale into the
        seconds slot, multi-unit ones (decades/centuries/millennia/
        quarters) into years/months (round-10 wave-4 close)."""
        hit = self._call_args(self._TO_INTERVAL_RE, sql)
        if not hit:
            return sql
        m, close, args = hit
        tail = self._rewrite_to_interval(sql[close + 1 :])
        n = self._rewrite_to_interval(args[0]) if args else "0"
        unit = m.group(1).lower()
        scaled = {
            "milliseconds": ("seconds", f"({n}) / 1000.0"),
            "microseconds": ("seconds", f"({n}) / 1000000.0"),
            "decades": ("years", f"({n}) * 10"),
            "centuries": ("years", f"({n}) * 100"),
            "millennia": ("years", f"({n}) * 1000"),
            "quarters": ("months", f"({n}) * 3"),
        }
        unit, val = scaled.get(unit, (unit, f"({n})"))
        slots = ["0"] * 7
        slots[self._MAKE_INTERVAL_SLOT[unit]] = f"({val})"
        return sql[: m.start()] + f"make_interval({', '.join(slots)})" + tail

    # -- sweep batch 5: sha256, char-set trims ----------------------------

    _SHA256_RE = re.compile(r"(?i)\bsha256\s*\(")
    _TRIM2_RE = re.compile(r"(?i)\b([lr]?)trim\s*\(")

    def _rewrite_sha256(self, sql: str) -> str:
        hit = self._call_args(self._SHA256_RE, sql)
        if not hit:
            return sql
        m, close, args = hit
        tail = self._rewrite_sha256(sql[close + 1 :])
        x = self._rewrite_sha256(args[0]) if args else ""
        return sql[: m.start()] + f"sha2(({x}), 256)" + tail

    def _rewrite_trim_chars(self, sql: str) -> str:
        """2-arg ltrim/rtrim/trim(string, charset) → TRIM(LEADING/
        TRAILING/BOTH charset FROM string): Spark's own 2-arg forms take
        the arguments in the OPPOSITE order (trimStr first), which
        silently trims the wrong operand — bare 2-arg trim() included
        (batch-18 find). 1-arg forms are identical and left alone."""
        pos = 0
        while True:
            hit = self._call_args(self._TRIM2_RE, sql, pos)
            if not hit:
                return sql
            m, close, args = hit
            if len(args) != 2:
                pos = m.end()
                continue
            side = {"l": "LEADING", "r": "TRAILING", "": "BOTH"}[m.group(1).lower()]
            s = self._rewrite_trim_chars(args[0])
            c = self._rewrite_trim_chars(args[1])
            repl = f"TRIM({side} {c} FROM ({s}))"
            sql = sql[: m.start()] + repl + sql[close + 1 :]
            pos = m.start() + len(repl)

    # -- sweep batch 6: quantified comparisons, ordered first/last,
    # struct_extract, list_has_all, divide/xor ----------------------------

    # lhs: identifier chain, number, or string literal (batch 23 widened
    # the literal forms so `1 = ALL (subq)` raises explicitly instead of
    # reaching Spark's parser)
    _QUANT_CMP_RE = re.compile(
        r"(?P<lhs>[A-Za-z_][\w.]*|\d+(?:\.\d+)?|'(?:[^']|'')*')\s*"
        r"(?P<op><>|!=|<=|>=|=|<|>)\s*"
        r"(?P<q>ANY|ALL|SOME)\s*\(",
        re.IGNORECASE,
    )
    _FIRST_LAST_RE = re.compile(r"(?i)\b(first|last|any_value)\s*\(")
    _STRUCT_EXTRACT_RE = re.compile(r"(?i)\bstruct_extract\s*\(")
    _LIST_HAS_ALL_RE = re.compile(r"(?i)\blist_has_all\s*\(")
    _LIST_INDEX_RE = re.compile(r"(?i)\b(?:list_element|list_extract|array_extract)\s*\(")
    _LIST_CONCAT_RE = re.compile(r"(?i)\b(?:list_concat|list_cat|array_concat|array_cat)\s*\(")
    _LIST_HAS_ANY_RE = re.compile(r"(?i)\b(?:list_has_any|array_has_any)\s*\(")
    _DIVIDE_RE = re.compile(r"(?i)\bdivide\s*\(")
    _XOR_RE = re.compile(r"(?i)\bxor\s*\(")
    _ADD_RE = re.compile(r"(?i)\badd\s*\(")
    _SUBTRACT_RE = re.compile(r"(?i)\bsubtract\s*\(")
    _MULTIPLY_RE = re.compile(r"(?i)\bmultiply\s*\(")
    _MOD_FN_RE = re.compile(r"(?i)\bmod\s*\(")

    def _rewrite_quantified_cmp(self, sql: str) -> str:
        """``x op ANY/SOME(arr)`` → exists(arr, e -> x op e); ``x op
        ALL(arr)`` → forall(...). Subquery operands map to IN / NOT IN
        where semantics allow (= ANY, <>/!= ALL); other op+subquery
        combinations raise. Simple-identifier left operands only."""
        pos = 0
        while True:
            m = self._search_code(self._QUANT_CMP_RE, sql, pos)
            if not m:
                return sql
            close = self._find_close(sql, m.end() - 1)
            if close == -1:
                return sql
            inner = sql[m.end() : close].strip()
            lhs, op, q = m.group("lhs"), m.group("op"), m.group("q").upper()
            if op == "!=":
                op = "<>"
            if re.match(r"(?is)^select\b", inner):
                if op == "=" and q in ("ANY", "SOME"):
                    repl = f"{lhs} IN ({inner})"
                elif op == "<>" and q == "ALL":
                    repl = f"{lhs} NOT IN ({inner})"
                else:
                    raise UQueryError.sql_error(
                        f"{op} {q}(subquery) is not supported (only = ANY / <> ALL)"
                    )
            else:
                fn = "forall" if q == "ALL" else "exists"
                repl = f"{fn}(({inner}), uq_qe -> {lhs} {op} uq_qe)"
            sql = sql[: m.start()] + repl + sql[close + 1 :]
            pos = m.start() + len(repl)

    _B28_AGG_RE = re.compile(
        r"(?i)\b(arg_max|arg_min|argmax|argmin|max_by|min_by|avg|mean|corr)\s*\("
    )
    _TOPN_MINMAX_RE = re.compile(r"(?i)(?<![\w.])(max|min)\s*\(")
    _PY_LAMBDA_RE = re.compile(r"(?i)\blambda\s+(\w+(?:\s*,\s*\w+)*)\s*:")

    def _rewrite_topn_minmax(self, sql: str) -> str:
        """DuckDB ≥1.1 ``max(arg, n)`` / ``min(arg, n)`` (the reference
        pins 1.5.2): a LIST of the n largest/smallest values, largest-
        first / smallest-first, NULLs skipped (collect_list drops them).
        Previously a loud wrong-arity error. Only fires when the second
        argument is a positive integer literal — DuckDB itself requires
        a constant n, and 1-arg max/min stay native. Scale note: this
        emission buffers each group's values (collect_list) where
        DuckDB keeps a bounded heap — fine for the grouped-top-n shapes
        it serves; a corpus-wide top-n belongs to TakeOrdered queries."""
        pos = 0
        while True:
            hit = self._call_args(self._TOPN_MINMAX_RE, sql, pos)
            if not hit:
                return sql
            m, close, args = hit
            if len(args) != 2 or not re.fullmatch(r"\+?\d+", args[1].strip()):
                pos = m.end()
                continue
            x, n = args[0], args[1].strip()
            if int(n) < 1:
                raise UQueryError.sql_error(
                    f"{m.group(1).lower()}: n must be a positive integer constant"
                )
            body = f"array_sort(collect_list(({x})))"
            if m.group(1).lower() == "max":
                body = f"reverse({body})"
            repl = f"slice({body}, 1, {n})"
            sql = sql[: m.start()] + repl + sql[close + 1 :]
            pos = m.start() + len(repl)

    def _rewrite_b28_aggs(self, sql: str) -> str:
        """Agg-fuzzer catches (batch 28, DuckDB-verified):

        - arg_max/arg_min (and their max_by/min_by spellings) SKIP rows
          whose VALUE argument is NULL in DuckDB; Spark's max_by can
          return one → the ordering key is nulled on NULL-value rows
          (Spark skips NULL keys);
        - avg/mean over DECIMAL returns DOUBLE in DuckDB while Spark
          keeps DECIMAL(p, s+4) — a silent precision difference →
          avg(CAST(x AS DOUBLE)) (no-op for the int/double columns
          everywhere else);
        - corr over zero-variance input is NULL in DuckDB but a
          DIVIDE_BY_ZERO error under Spark's ANSI mode → pairwise-
          complete covar_pop / (σx·σy) with try_divide.
        """
        pos = 0
        while True:
            hit = self._call_args(self._B28_AGG_RE, sql, pos)
            if not hit:
                return sql
            m, close, args = hit
            fn = m.group(1).lower()
            if fn in ("avg", "mean"):
                if len(args) != 1:
                    pos = m.end()
                    continue
                a = args[0].strip()
                dm = re.match(r"(?i)^distinct\s+", a)
                prefix, a = ("DISTINCT ", a[dm.end() :]) if dm else ("", a)
                repl = f"avg({prefix}CAST(({a}) AS DOUBLE))"
                # avg over INTERVAL is native in both engines and the
                # DOUBLE cast fails analysis — poly-probe the cast form,
                # native avg as fallback. Skipped when a call clause
                # (OVER/FILTER/WITHIN) follows: the poly resolver
                # parenthesizes its pick, which breaks `agg() OVER`
                # syntax (interval window-avg stays a loud error).
                if not re.match(r"(?i)\s*(over|filter|within)\b", sql[close + 1 :]):
                    repl = f"uq_poly(avg({prefix}({a})), {repl})"
            elif fn == "corr":
                if len(args) != 2:
                    pos = m.end()
                    continue
                x, y = args
                repl = (
                    f"try_divide(covar_pop(({x}), ({y})), "
                    f"stddev_pop(IF(({y}) IS NULL, NULL, ({x}))) * "
                    f"stddev_pop(IF(({x}) IS NULL, NULL, ({y}))))"
                )
            else:
                desc = fn in ("arg_max", "argmax", "max_by")
                if len(args) == 3:
                    # DuckDB ≥1.1 top-n form (the reference pins 1.5.2):
                    # arg_max(arg, val, n) = LIST of arg for the top-n
                    # rows by val (val-descending; rows where EITHER arg
                    # or val is NULL skip — DuckDB probe: arg_max(x, y)
                    # over (NULL,30),(3,20),(5,10) returns 3, skipping
                    # the NULL-arg row with the max val; the null struct
                    # vanishes from collect_list, mirroring the 2-arg
                    # emission's IF guard — ADVICE r12). n must be a
                    # positive integer literal, like DuckDB's constant-n
                    # requirement. Tie order among equal vals is
                    # unspecified in DuckDB; here ties break by arg
                    # (struct sort), deterministic.
                    x, k, n = (a.strip() for a in args)
                    if not re.fullmatch(r"\+?\d+", n) or int(n) < 1:
                        raise UQueryError.sql_error(
                            f"{fn}: n must be a positive integer constant"
                        )
                    pairs = (
                        f"array_sort(collect_list(CASE WHEN ({k}) IS NULL "
                        f"OR ({x}) IS NULL "
                        f"THEN NULL ELSE struct(({k}) AS uq_k, ({x}) AS uq_v) END))"
                    )
                    if desc:
                        pairs = f"reverse({pairs})"
                    repl = f"slice(transform({pairs}, uq_s -> uq_s.uq_v), 1, {n})"
                elif len(args) == 2:
                    x, k = args
                    out = "max_by" if desc else "min_by"
                    repl = f"{out}(({x}), IF(({x}) IS NULL, NULL, ({k})))"
                else:
                    raise UQueryError.sql_error(f"{fn} expects (value, key[, n])")
            sql = sql[: m.start()] + repl + sql[close + 1 :]
            pos = m.start() + len(repl)

    def _rewrite_first_last_order(self, sql: str) -> str:
        """DuckDB ``first/last(x ORDER BY y [DESC])`` → min_by/max_by
        (single sort key; the argless forms are native in both and left
        alone). Batch 18: ``any_value(x ORDER BY y)`` is the same
        positional pick but skips NULL x — the sort key is wrapped in
        CASE WHEN x IS NOT NULL so min_by/max_by ignore NULL-x rows
        (they skip NULL ordering keys), reproducing first-NON-NULL-in-
        order exactly."""
        pos = 0
        while True:
            hit = self._call_args(self._FIRST_LAST_RE, sql, pos)
            if not hit:
                return sql
            m, close, args = hit
            inner = sql[m.end() : close]
            split = re.split(r"(?i)\border\s+by\b", inner, maxsplit=1)
            if len(split) != 2 or len(args) != 1:
                pos = m.end()
                continue
            x, order = split[0].strip().rstrip(","), split[1].strip()
            nf = re.search(r"(?i)\bnulls\s+(first|last)\s*$", order)
            nulls_last = True  # DuckDB default, both directions
            if nf:
                nulls_last = nf.group(1).lower() == "last"
                order = order[: nf.start()].strip()
            desc = bool(re.search(r"(?i)\bdesc\s*$", order))
            key = re.sub(r"(?i)\s+(asc|desc)\s*$", "", order)
            fname = m.group(1).lower()
            take_min = (fname != "last") != desc
            fn = "min_by" if take_min else "max_by"
            # batch 28 (agg-fuzzer catch): first/last KEEP NULL values —
            # a NULL-key row at the ordering's end IS the `last` pick
            # (the old bare min_by/max_by skipped NULL keys). The
            # composite (null-rank, key) struct encodes the placement;
            # any_value keeps its skip-NULL-x semantics via the CASE.
            null_wins = (not nulls_last) if fname != "last" else nulls_last
            # fn=min_by: null wins ⇔ flag -1; fn=max_by: null wins ⇔ +1
            flag_null = -1 if (null_wins == (fn == "min_by")) else 1
            composite = (
                f"struct(IF(({key}) IS NULL, {flag_null}, 0) AS uq_nr, "
                f"({key}) AS uq_k)"
            )
            if fname == "any_value":
                key_expr = f"CASE WHEN ({x}) IS NOT NULL THEN {composite} END"
            else:
                key_expr = composite
            repl = f"{fn}({x}, {key_expr})"
            sql = sql[: m.start()] + repl + sql[close + 1 :]
            pos = m.start() + len(repl)

    def _rewrite_struct_extract(self, sql: str) -> str:
        """struct_extract(s, 'k') → (s).k (literal keys only)."""
        hit = self._call_args(self._STRUCT_EXTRACT_RE, sql)
        if not hit:
            return sql
        m, close, args = hit
        tail = self._rewrite_struct_extract(sql[close + 1 :])
        if len(args) != 2:
            raise UQueryError.sql_error("struct_extract expects (struct, 'key')")
        key = self._lit_parse(args[1])
        if key is None or not re.fullmatch(r"\w+", key):
            raise UQueryError.sql_error(
                "struct_extract: only literal identifier keys are supported"
            )
        s = self._rewrite_struct_extract(args[0])
        return sql[: m.start()] + f"(({s}).{key})" + tail

    def _rewrite_list_has_all(self, sql: str) -> str:
        hit = self._call_args(self._LIST_HAS_ALL_RE, sql)
        if not hit:
            return sql
        m, close, args = hit
        tail = self._rewrite_list_has_all(sql[close + 1 :])
        if len(args) != 2:
            raise UQueryError.sql_error("list_has_all expects (list, sublist)")
        a = self._rewrite_list_has_all(args[0])
        b = self._rewrite_list_has_all(args[1])
        repl = f"forall(({b}), uq_he -> array_contains(({a}), uq_he))"
        return sql[: m.start()] + repl + tail

    # -- sweep batch 7: explicit raises for untranslatable idioms ---------

    _UNSUPPORTED_FN_RE = re.compile(
        r"(?i)\b(md5_number|"
        r"txid_current|get_current_time|"
        r"bit_position|"
        r"left_grapheme|right_grapheme)\s*\("
    )  # timezone/bar moved to batch-23, age to batch-28 translations,
    # make_time to the round-8 TIME graduation (native under
    # spark.sql.timeType.enabled — fractional-seconds parity probed)
    _LIMIT_PCT_RE = re.compile(r"(?i)\blimit\s+\d+(?:\.\d+)?\s*%")
    _BIT_ENUM_RE = re.compile(
        r"(?i)(::\s*bit(?:string)?\b|\bas\s+bit(?:string)?\s*[),]|\benum\s*\()"
    )

    def _raise_unsupported(self, sql: str) -> str:
        """Batch-7 sweep: idioms DuckDB admits that have no faithful
        Spark translation RAISE here instead of reaching Catalyst as a
        garbled expression (the sweep's translate-or-raise rule).
        md5_number returns a full HUGEINT (no 128-bit Spark integer —
        the _lower/_upper halves ARE translated, batch 15; round-7
        probe: composing the halves into DECIMAL(38,0) — Spark's max
        precision — overflows for ~40% of digests, since |little-endian
        int128| reaches 1.70e38 > 10^38-1, e.g. md5_number('abc') =
        1.52e38; a partial translation would be a silent trap, so the
        raise stays), age() is
        volatile INTERVAL arithmetic, make_time needs a TIME type,
        timezone() needs session-tz semantics, graphemes need cluster
        segmentation, BITSTRING/ENUM are DuckDB-only types. Batch 15
        closed the former members struct_insert/mad/entropy/histogram/
        jaro*/damerau/strip_accents/nfc_normalize/gamma/lgamma/
        parse_dir*/md5_number_lower|upper/LIMIT n% — see
        _rewrite_parity_fns, _rewrite_nested_aggs,
        _rewrite_struct_insert, _rewrite_limit_pct."""
        m = self._search_code(self._UNSUPPORTED_FN_RE, sql)
        if m:
            raise UQueryError.sql_error(
                f"{m.group(1)}() has no Spark equivalent (unsupported)"
            )
        m = self._search_code(self._BIT_ENUM_RE, sql)
        if m:
            raise UQueryError.sql_error(
                "BITSTRING/ENUM types are not supported"
            )
        return sql

    # -- sweep batch 15: UDF-backed parity scalars, nested aggregates,
    # struct_insert (schema-probed), LIMIT n% ------------------------------

    _PARITY_FN_MAP = {
        "jaro_winkler_similarity": "uq_jaro_winkler",
        "jaro_similarity": "uq_jaro",
        "damerau_levenshtein": "uq_damerau_lev",
        "strip_accents": "uq_strip_accents",
        "nfc_normalize": "uq_nfc_normalize",
        "lgamma": "uq_lgamma",
        "gamma": "uq_gamma",
        "nextafter": "uq_nextafter",
        # Python re.escape (3.7+) IS RE2 QuoteMeta: every ASCII
        # non-word char escaped, non-ASCII untouched (DuckDB-verified)
        "regexp_escape": "uq_regexp_escape",
        "greatest_common_divisor": "uq_gcd",
        "least_common_multiple": "uq_lcm",
        "gcd": "uq_gcd",
        "lcm": "uq_lcm",
        "parse_dirname": "uq_parse_dirname",
        "parse_dirpath": "uq_parse_dirpath",
        "parse_path": "uq_parse_path",
        # batch 22: UAX-29 grapheme clusters (utf8proc parity)
        "length_grapheme": "uq_length_grapheme",
    }
    _PARITY_FN_RE = re.compile(
        r"(?i)\b(" + "|".join(_PARITY_FN_MAP) + r")\s*\("
    )
    _MD5_HALF_RE = re.compile(r"(?i)\bmd5_number_(lower|upper)\s*\(")

    def _rewrite_parity_fns(self, sql: str) -> str:
        """Batch-15 sweep: DuckDB scalars with no Spark builtin →
        Arrow-batched pandas UDFs (functions/parity_udfs.py), registered
        lazily on first use so plain driver sessions get them without
        engine setup. Semantics pinned against DuckDB there (byte-based
        distances, Winkler 0.7 threshold, unrestricted Damerau, NFD→
        drop-marks→NFC accent stripping, gamma pole behavior, the
        parse_dir* trailing-separator rules).

        md5_number_lower/upper need no UDF: DuckDB reads the two UBIGINT
        halves little-endian from the digest (lower = bytes 9-16, upper
        = bytes 1-8 — verified against hashlib) → byte-pair-reversed
        conv(hex, 16, 10) on Spark's own md5(), CAST to DECIMAL(20,0)
        because the unsigned values exceed BIGINT (width deviation:
        UBIGINT → DECIMAL(20,0), same digits)."""
        while True:
            hit = self._call_args(self._MD5_HALF_RE, sql)
            if not hit:
                break
            m, close, args = hit
            if len(args) != 1:
                raise UQueryError.sql_error("md5_number_*: expects 1 argument")
            # hex chars of byte i (1-based) are (2i-1, 2i); little-endian
            # means emitting bytes high-to-low: 16..9 (lower) / 8..1 (upper)
            byte_range = range(16, 8, -1) if m.group(1).lower() == "lower" else range(8, 0, -1)
            # md5 repeated per byte-pair — Catalyst CSE collapses the
            # common subexpression to one digest per row
            pairs = ", ".join(
                f"substr(md5(({args[0]})), {2 * b - 1}, 2)" for b in byte_range
            )
            repl = f"CAST(conv(concat({pairs}), 16, 10) AS DECIMAL(20, 0))"
            sql = sql[: m.start()] + repl + sql[close + 1 :]
        m = self._search_code(self._PARITY_FN_RE, sql)
        if not m:
            return sql
        from .functions.parity_udfs import register_parity_udfs

        register_parity_udfs(self.spark)
        out, pos = [], 0
        while m:
            out.append(sql[pos : m.start()])
            out.append(self._PARITY_FN_MAP[m.group(1).lower()] + "(")
            pos = m.end()
            m = self._search_code(self._PARITY_FN_RE, sql, pos)
        out.append(sql[pos:])
        return "".join(out)

    # -- sweep batch 18 -----------------------------------------------------

    _TRIM_STD_RE = re.compile(
        r"(?i)\btrim\s*\(\s*(both|leading|trailing)\b"
    )

    def _rewrite_trim_std(self, sql: str) -> str:
        """Batch-18: SQL-standard ``TRIM([BOTH|LEADING|TRAILING] [chars]
        FROM str)``. Spark parses this natively, but the quoted operand
        after FROM matched the path-as-table regex first — `trim(BOTH
        'x' FROM 'y')` became a table scan of path 'y' (misparse class,
        found by the sweep). Runs BEFORE _rewrite_path_tables and emits
        the DuckDB FUNCTION forms (trim/ltrim/rtrim(s[, chars])) so the
        batch-5 charset-order pass translates them uniformly."""
        while True:
            m = self._search_code(self._TRIM_STD_RE, sql)
            if not m:
                return sql
            open_i = sql.index("(", m.start())
            close = self._find_close(sql, open_i)
            if close == -1:
                return sql
            inner = sql[open_i + 1 : close]
            kw = m.group(1).lower()
            rest = inner[re.search(r"(?i)\b" + kw, inner).end() :]
            split = None
            for s, e, _w in self._scan_top_level(rest, {"from"}):
                split = (s, e)
                break
            if split is None:
                raise UQueryError.sql_error(
                    "TRIM: expected FROM in the standard form"
                )
            chars = rest[: split[0]].strip()
            src = rest[split[1] :].strip()
            fn = {"both": "trim", "leading": "ltrim", "trailing": "rtrim"}[kw]
            # DuckDB-convention 2-arg order (string, chars) — the
            # batch-5/18 charset pass reorders for Spark downstream
            repl = f"{fn}(({src}), ({chars}))" if chars else f"{fn}(({src}))"
            sql = sql[: m.start()] + repl + sql[close + 1 :]

    _LIST_WHERE_RE = re.compile(r"(?i)\blist_where\s*\(")

    def _rewrite_list_where(self, sql: str) -> str:
        """Batch-18: ``list_where(l, mask)`` → mask-select via zipped
        structs (NULL mask entries drop the element, like DuckDB)."""
        while True:
            hit = self._call_args(self._LIST_WHERE_RE, sql)
            if not hit:
                return sql
            m, close, args = hit
            if len(args) != 2:
                raise UQueryError.sql_error("list_where expects (list, mask)")
            l, mask = args
            repl = (
                f"transform(filter(zip_with(({l}), ({mask}), "
                f"(uq_we, uq_wm) -> struct(uq_we AS e, uq_wm AS m)), "
                f"uq_ws -> uq_ws.m), uq_ws -> uq_ws.e)"
            )
            sql = sql[: m.start()] + repl + sql[close + 1 :]

    # -- sweep batch 27: information_schema ---------------------------------

    _INFO_SCHEMA_RE = re.compile(
        r"(?i)\binformation_schema\s*\.\s*(tables|columns)\b"
    )

    # DuckDB's information_schema.tables columns (DESCRIBE-probed)
    _IS_TABLES_COLS = (
        "table_catalog", "table_schema", "table_name", "table_type",
        "self_referencing_column_name", "reference_generation",
        "user_defined_type_catalog", "user_defined_type_schema",
        "user_defined_type_name", "is_insertable_into", "is_typed",
        "commit_action", "TABLE_COMMENT",
    )
    # the SQL-standard 45-column shape, DuckDB-probed; only the core
    # identification columns carry values (like DuckDB's own view)
    _IS_COLUMNS_COLS = (
        "table_catalog", "table_schema", "table_name", "column_name",
        "ordinal_position", "column_default", "is_nullable", "data_type",
        "character_maximum_length", "character_octet_length",
        "numeric_precision", "numeric_precision_radix", "numeric_scale",
        "datetime_precision", "interval_type", "interval_precision",
        "character_set_catalog", "character_set_schema",
        "character_set_name", "collation_catalog", "collation_schema",
        "collation_name", "domain_catalog", "domain_schema", "domain_name",
        "udt_catalog", "udt_schema", "udt_name", "scope_catalog",
        "scope_schema", "scope_name", "maximum_cardinality",
        "dtd_identifier", "is_self_referencing", "is_identity",
        "identity_generation", "identity_start", "identity_increment",
        "identity_maximum", "identity_minimum", "identity_cycle",
        "is_generated", "generation_expression", "is_updatable",
        "COLUMN_COMMENT",
    )

    @staticmethod
    def _sql_str(v) -> str:
        if v is None:
            return "CAST(NULL AS STRING)"
        return "'" + str(v).replace("'", "''") + "'"

    def _rewrite_information_schema(self, sql: str) -> str:
        """``information_schema.tables`` / ``.columns`` (batch 27 — BI
        tools and the reference's DuckDB both expose them) → inline
        derived tables built from the Spark catalog at rewrite time,
        aliased ``tables``/``columns`` like DuckDB's bare references.
        catalog/schema render as DuckDB's in-memory identity
        ('memory'/'main'); data_type uses DuckDB typenames (the
        batch-24 mapper); internal ``uq_*`` plumbing views are
        filtered. Zero-table catalogs yield a typed empty relation."""
        if not self._search_code(self._INFO_SCHEMA_RE, sql):
            return sql
        from .functions.parity_udfs import _duck_typename

        tabs = [
            t
            for t in self.spark.catalog.listTables()
            if not t.name.startswith("uq_")
        ]

        def emit(rel: str) -> str:
            if rel == "tables":
                cols, rows = self._IS_TABLES_COLS, [
                    (
                        "memory", "main", t.name,
                        "VIEW" if t.tableType in (None, "TEMPORARY", "VIEW")
                        else "BASE TABLE",
                        None, None, None, None, None, "NO", "NO", None, None,
                    )
                    for t in tabs
                ]
                num_cols: set[str] = set()
            else:
                cols = self._IS_COLUMNS_COLS
                num_cols = {
                    "ordinal_position", "character_maximum_length",
                    "character_octet_length", "numeric_precision",
                    "numeric_precision_radix", "numeric_scale",
                    "datetime_precision", "interval_precision",
                    "maximum_cardinality",
                }
                rows = []
                for t in tabs:
                    for i, c in enumerate(self.spark.catalog.listColumns(t.name)):
                        row = {k: None for k in cols}
                        row.update(
                            table_catalog="memory", table_schema="main",
                            table_name=t.name, column_name=c.name,
                            ordinal_position=i + 1, is_nullable="YES",
                            data_type=_duck_typename(c.dataType),
                            is_self_referencing="NO", is_identity="NO",
                            identity_cycle="NO", is_generated="NEVER",
                            is_updatable="NO",
                        )
                        rows.append(tuple(row[k] for k in cols))
            col_list = ", ".join(f"`{c}`" for c in cols)
            if rows:
                vals = ", ".join(
                    "("
                    + ", ".join(
                        (str(v) if isinstance(v, int) else self._sql_str(v))
                        if cols[j] not in num_cols or v is not None
                        else "CAST(NULL AS INT)"
                        for j, v in enumerate(r)
                    )
                    + ")"
                    for r in rows
                )
                return f"(SELECT * FROM (VALUES {vals}) AS uq_is({col_list})) AS {rel}"
            typed = ", ".join(
                f"CAST(NULL AS {'INT' if c in num_cols else 'STRING'}) AS `{c}`"
                for c in cols
            )
            return f"(SELECT {typed} WHERE false) AS {rel}"

        stop_words = {
            "on", "where", "group", "order", "limit", "join", "inner",
            "left", "right", "full", "cross", "union", "except",
            "intersect", "using", "having", "qualify", "offset", "fetch",
            "asof", "positional", "semi", "anti",
        }
        pos = 0
        while True:
            m = self._search_code(self._INFO_SCHEMA_RE, sql, pos)
            if not m:
                return sql
            repl = emit(m.group(1).lower())
            # a user alias right after the reference replaces ours
            nxt = re.match(r"\s+(as\s+)?([A-Za-z_]\w*)", sql[m.end() :])
            if nxt and nxt.group(2).lower() not in stop_words:
                repl = repl.rsplit(" AS ", 1)[0]
            sql = sql[: m.start()] + repl + sql[m.end() :]
            pos = m.start() + len(repl)

    # -- sweep batch 26: session DDL ----------------------------------------

    _CREATE_VIEW_RE = re.compile(
        r"(?is)^\s*create\s+(or\s+replace\s+)?(?:temp(?:orary)?\s+)?view\s+"
        r"([\w.\"]+)\s+as\s+(.*)$"
    )
    _CREATE_TABLE_RE = re.compile(
        r"(?is)^\s*create\s+(or\s+replace\s+)?(?:temp(?:orary)?\s+)?table\s+"
        r"([\w.\"]+)\s+as\s+(.*)$"
    )
    _DROP_RE = re.compile(
        r"(?is)^\s*drop\s+(view|table)\s+(if\s+exists\s+)?([\w.\"]+)\s*;?\s*$"
    )
    _DML_RE = re.compile(r"(?is)^\s*(insert|update|delete|merge|truncate)\b")
    _CREATE_MACRO_RE = re.compile(
        r"(?is)^\s*create\s+(or\s+replace\s+)?(?:temp(?:orary)?\s+)?"
        r"(?:macro|function)\s+(\w+)\s*\(([^)]*)\)\s+as\s+(table\s+)?(.*?)\s*;?\s*$"
    )
    _DROP_MACRO_RE = re.compile(
        r"(?is)^\s*drop\s+(?:macro|function)\s+(if\s+exists\s+)?(\w+)\s*;?\s*$"
    )

    def _session_object_exists(self, name: str) -> bool:
        """True when ``name`` resolves to a live session table/view
        (temp views included — ``tableExists`` sees them)."""
        try:
            return self.spark.catalog.tableExists(name.strip('"'))
        except Exception:
            return False

    @staticmethod
    def _body_references(body: str, name: str) -> bool:
        """True when ``name`` appears as an identifier token in
        ``body`` outside string literals — the CREATE OR REPLACE
        self-reference probe (round-10 ADVICE). Deliberately
        over-matches (a column/alias/function spelled like the table
        also hits): a false positive only routes the replace through
        the always-correct parquet-spill path."""
        txt = re.sub(r"'(?:[^']|'')*'", " ", body)
        want = name.strip('"').strip("`").lower()
        return any(
            t.lower() == want for t in re.findall(r"[A-Za-z_]\w*", txt)
        )

    def _rewrite_session_ddl(self, sql: str) -> str:
        """Session-scoped DDL (batch 26 — the reference's pooled DuckDB
        connections admit in-session CREATE/DROP, main.rs exercises
        CREATE TABLE AS via --init-sql):

        - CREATE [OR REPLACE] [TEMP] VIEW name AS body → a TEMPORARY
          view (session-scoped, like a DuckDB in-memory connection —
          never the persistent metastore), with the body run through
          the FULL dialect pipeline;
        - CREATE [OR REPLACE] [TEMP] TABLE name AS body → CACHE TABLE
          name AS body (temp view + eager materialization — the
          closest Spark shape to DuckDB's CTAS; re-evaluation
          non-determinism is what the cache removes);
        - DROP VIEW/TABLE [IF EXISTS] name → DROP VIEW on the temp
          view;
        - INSERT/UPDATE/DELETE/MERGE/TRUNCATE raise: the rebuild's
          session tables are views over immutable sources (documented
          deviation — DuckDB's in-memory tables are mutable).
        """
        m = self._CREATE_VIEW_RE.match(sql)
        if m:
            orep, name, body = m.groups()
            return (
                f"CREATE {'OR REPLACE ' if orep else ''}TEMPORARY VIEW "
                f"{name.strip()} AS {self.rewrite(body)}"
            )
        m = self._CREATE_TABLE_RE.match(sql)
        if m:
            orep, name, body = m.groups()
            name = name.strip()
            # Rewrite (and analysis-probe) the body BEFORE any drop side
            # effect: DuckDB's CREATE OR REPLACE keeps the old object when
            # the new definition fails for ANY reason (ADVICE r7 closed
            # rewrite/analysis failures; r9 closes the runtime hole,
            # NOTES 21b). A rewrite error below leaves the prior table
            # intact; when the name is live we ALSO materialize the new
            # body to completion under a staging name first — only after
            # that eager CACHE succeeds do the drop+swap side effects run,
            # so an execution-time failure (ANSI overflow, bad cast on a
            # late row, ...) keeps the old table answering.
            new_body = self.rewrite(body)
            if orep and self._session_object_exists(name):
                if self._body_references(new_body, name):
                    # SELF-REFERENTIAL replace (round-10 ADVICE):
                    # CREATE OR REPLACE TABLE t AS SELECT … FROM t. The
                    # cache-swap path below re-analyzes the body after
                    # the drop, where t no longer resolves — the old
                    # table would be lost AND the statement would fail.
                    # Materialize the new body to parquet FIRST (runs
                    # the full job — any runtime failure raises here
                    # with the old table intact), then swap to a view
                    # over the spilled files, which resolve regardless
                    # of t's fate. Token-scan detection over-matches
                    # (a name that is also a function/alias) — the only
                    # cost is taking this always-correct path.
                    import tempfile

                    root = getattr(self, "_cor_spill_root", None)
                    if root is None:
                        root = tempfile.mkdtemp(prefix="uq_cor_spill_")
                        self._cor_spill_root = root
                    path = os.path.join(
                        root, re.sub(r"\W", "_", name) + "_" + uuid.uuid4().hex[:8]
                    )
                    self.spark.sql(
                        f"SELECT * FROM ({new_body}) uq_cor_src"
                    ).write.parquet(path)
                    self.spark.sql(f"UNCACHE TABLE IF EXISTS {name}")
                    self.spark.sql(f"DROP VIEW IF EXISTS {name}")
                    self.spark.sql(
                        f"CACHE TABLE {name} AS SELECT * FROM parquet.`{path}`"
                    )
                    return f"SELECT * FROM {name} LIMIT 0"
                stage = f"{name}__uq_stage_{uuid.uuid4().hex[:8]}"
                try:
                    # eager: runs the full materialization job now; a
                    # runtime failure raises here with zero side effects
                    self.spark.sql(f"CACHE TABLE {stage} AS {new_body}")
                except Exception:
                    self.spark.sql(f"UNCACHE TABLE IF EXISTS {stage}")
                    self.spark.sql(f"DROP VIEW IF EXISTS {stage}")
                    raise
                try:
                    self.spark.sql(f"UNCACHE TABLE IF EXISTS {name}")
                    self.spark.sql(f"DROP VIEW IF EXISTS {name}")
                    # re-cache under the live name FROM THE BODY: the
                    # CacheManager substitutes the staged InMemoryRelation
                    # by analyzed-plan equality, so this second CACHE reads
                    # the already-proven cache rather than re-running the
                    # query against the sources (a temp view's stored plan
                    # re-resolves on access, so `SELECT * FROM stage` would
                    # dangle once the staging view drops)
                    self.spark.sql(f"CACHE TABLE {name} AS {new_body}")
                finally:
                    self.spark.sql(f"UNCACHE TABLE IF EXISTS {stage}")
                    self.spark.sql(f"DROP VIEW IF EXISTS {stage}")
                return f"SELECT * FROM {name} LIMIT 0"
            if orep:
                # name not live: nothing to lose, keep the direct
                # single-materialization path
                self.spark.sql(f"SELECT * FROM ({new_body}) LIMIT 0")
                self.spark.sql(f"UNCACHE TABLE IF EXISTS {name}")
                self.spark.sql(f"DROP VIEW IF EXISTS {name}")
            return f"CACHE TABLE {name} AS {new_body}"
        m = self._CREATE_MACRO_RE.match(sql)
        if m:
            # batch 28: in-session CREATE [OR REPLACE] MACRO — the same
            # inline-at-bind machinery the --db-file attach uses
            # (reference main.rs:413-450 provisions macros; users also
            # define them per session in DuckDB)
            orep, name, params, is_table, body = m.groups()
            if not orep and name.lower() in self._macros:
                raise UQueryError.sql_error(
                    f"Macro with name \"{name}\" already exists "
                    f"(use CREATE OR REPLACE)"
                )
            if is_table:
                if params.strip():
                    # parameterized table macro: same inline-at-bind
                    # expansion the --db-file attach path uses (the body
                    # becomes a derived table with args substituted)
                    plist = [p.strip() for p in params.split(",") if p.strip()]
                    self.add_scalar_macro(name, plist, body)
                else:
                    self.spark.sql(
                        f"CREATE OR REPLACE TEMPORARY VIEW {name} AS "
                        f"{self.rewrite(body)}"
                    )
                    self.add_table_macro(name)
            else:
                plist = [p.strip() for p in params.split(",") if p.strip()]
                self.add_scalar_macro(name, plist, body)
            return "SELECT 1 AS ok WHERE false"  # DDL: empty result
        m = self._DROP_MACRO_RE.match(sql)
        if m:
            ifex, name = m.groups()
            if name.lower() in self._macros:
                del self._macros[name.lower()]
            elif name.lower() in self._table_macros:
                self._table_macros.discard(name.lower())
                self.spark.sql(f"DROP VIEW IF EXISTS {name}")
            elif not ifex:
                raise UQueryError.sql_error(f"Macro \"{name}\" does not exist")
            return "SELECT 1 AS ok WHERE false"
        m = self._DROP_RE.match(sql)
        if m:
            _kind, ifex, name = m.groups()
            return f"DROP VIEW {'IF EXISTS ' if ifex else ''}{name.strip()}"
        if self._DML_RE.match(sql):
            raise UQueryError.sql_error(
                "data-modification statements are not supported: session "
                "tables are immutable views (use CREATE OR REPLACE TABLE "
                "name AS ... to rebuild)"
            )
        if re.match(r"(?is)^\s*create\b", sql):
            raise UQueryError.sql_error(
                "only CREATE [OR REPLACE] [TEMP] VIEW/TABLE ... AS <query> "
                "is supported"
            )
        return sql

    # -- sweep batch 25: dot-chaining / glob TVF / session literals ---------

    # `.name(` where the name isn't preceded by whitespace-only (an
    # operand must sit before the dot). Keywords that legitimately
    # follow a dot never carry a call paren.
    _DOT_CHAIN_RE = re.compile(r"\.\s*([A-Za-z_]\w*)\s*\(")

    def _rewrite_dot_chain(self, sql: str) -> str:
        """DuckDB function chaining: ``x.f(a, b)`` = ``f(x, a, b)``
        (``[1,2].list_sum()``, ``col.lower().trim()`` — probed working
        on columns, bracket results, and call results; a dotted STRING
        LITERAL is a parse error in DuckDB itself). Runs after the
        bracket pass (list literals are already array(...) calls, so
        every operand ends in an identifier chain, ')' or marker) and
        before the rename pass (chained names rename afterwards).

        Known ambiguity (documented): ``a.b(x)`` with ``a`` a schema
        name would be a qualified call — the gateway has no schemas, so
        the chain reading always wins."""
        while True:
            m = self._search_code(self._DOT_CHAIN_RE, sql)
            if not m:
                return sql
            close = self._find_close(sql, m.end() - 1)
            if close == -1:
                return sql
            # scan the operand backwards from the dot
            i = m.start()
            while i > 0 and sql[i - 1].isspace():
                i -= 1
            end = i
            if i > 0 and sql[i - 1] == ")":
                depth = 0
                while i > 0:
                    i -= 1
                    if sql[i] == ")":
                        depth += 1
                    elif sql[i] == "(":
                        depth -= 1
                        if depth == 0:
                            break
                j = i
                while j > 0 and (sql[j - 1].isalnum() or sql[j - 1] == "_"):
                    j -= 1
                i = j
            else:
                while i > 0 and (sql[i - 1].isalnum() or sql[i - 1] in "_."):
                    i -= 1
            operand = sql[i:end]
            if not operand or operand.endswith("."):
                # no operand (e.g. a decimal literal handled elsewhere)
                return sql
            fname = m.group(1)
            args = sql[m.end() : close].strip()
            inner = f"({operand})" + (f", {args}" if args else "")
            sql = sql[:i] + f"{fname}({inner})" + sql[close + 1 :]

    _JSON_CAST_RE = re.compile(r"(?i)\b(try_)?cast\s*\(")

    def _rewrite_json_cast(self, sql: str) -> str:
        """``CAST(x AS JSON)`` / ``x::JSON``: DuckDB VALIDATES a VARCHAR
        input and PRESERVES its text (whitespace kept — probed; json()
        is the minifying form), while other types encode through the
        json writer. The input's type is dispatched per ROW-CONSTANT
        typeof() (the uq_duck_typename UDF), so one translation serves
        any operand type."""
        pos = 0
        while True:
            hit = self._call_args(self._JSON_CAST_RE, sql, pos)
            if not hit:
                return sql
            m, close, args = hit
            parts = self._split_top(sql[m.end() : close], "as")
            if len(parts) != 2 or parts[1].strip().lower() != "json":
                pos = m.end()
                continue
            x = parts[0].strip()
            from .functions.parity_udfs import register_parity_udfs

            register_parity_udfs(self.spark)
            repl = (
                f"(CASE WHEN ({x}) IS NULL THEN CAST(NULL AS STRING) "
                f"ELSE uq_json_cast(uq_duck_typename(typeof(({x}))), "
                f"{self._jenc(x)}) END)"
            )
            sql = sql[: m.start()] + repl + sql[close + 1 :]
            pos = m.start() + len(repl)

    def _rewrite_interval_cast(self, sql: str) -> str:
        """``'1 day 2 hours'::INTERVAL`` / CAST(literal AS INTERVAL)
        (batch 28) → Spark's INTERVAL literal, which picks the proper
        ANSI interval class (day-time or year-month) so comparisons
        work — CAST-to-bare-INTERVAL yields the legacy calendar type
        that can't compare against interval literals. Mixed-class
        literals error loudly in Spark's parser (DuckDB's calendar
        intervals admit them — documented). Non-literal operands stay
        native."""
        pos = 0
        while True:
            hit = self._call_args(self._JSON_CAST_RE, sql, pos)
            if not hit:
                return sql
            m, close, args = hit
            parts = self._split_top(sql[m.end() : close], "as")
            if len(parts) != 2 or parts[1].strip().lower() != "interval":
                pos = m.end()
                continue
            lit = self._lit_parse(parts[0].strip())
            if lit is None:
                pos = m.end()
                continue
            repl = "INTERVAL '" + lit.replace("'", "''") + "'"
            sql = sql[: m.start()] + repl + sql[close + 1 :]
            pos = m.start() + len(repl)

    # no lookahead needed to exclude INTERVAL '1' DAY — its quoted text
    # has no unit words, so the term parser below rejects it anyway
    _MIXED_IVL_RE = re.compile(r"(?i)\bINTERVAL\s+'([^']+)'")
    _IVL_TERM_RE = re.compile(
        r"(?i)^\s*(-?\d+(?:\.\d+)?)\s*"
        r"(years?|months?|mons?|quarters?|weeks?|days?|hours?|hrs?|"
        r"minutes?|mins?|seconds?|secs?|milliseconds?|microseconds?)\b"
    )

    def _rewrite_mixed_interval_literal(self, sql: str) -> str:
        """Quoted interval literals that MIX year-month and day-time
        units (``INTERVAL '1 month 2 days 3 hours'``) — valid DuckDB
        calendar intervals that Spark's parser rejects outright
        (Cannot mix year-month and day-time fields; r13 probe batch B)
        → ``make_interval(y, m, w, d, h, mi, s)``, whose
        CalendarIntervalType holds both classes and adds to
        timestamps/dates natively. Single-class literals stay native
        (they keep Spark's comparable ANSI interval types), as does
        anything the term parser doesn't fully consume (Spark then
        raises loudly). Quarters fold to 3 months; DuckDB's per-term
        sign convention ('-1 month 3 days') carries through."""
        pos = 0
        while True:
            m = self._search_code(self._MIXED_IVL_RE, sql, pos)
            if not m:
                return sql
            text = m.group(1)
            slots = {"y": 0, "mo": 0, "w": 0, "d": 0, "h": 0, "mi": 0, "s": 0.0}
            unit_of = {
                "year": "y", "month": "mo", "mon": "mo", "quarter": "mo",
                "week": "w", "day": "d", "hour": "h", "hr": "h",
                "minute": "mi", "min": "mi", "second": "s", "sec": "s",
                "millisecond": "s", "microsecond": "s",
            }
            rest, ok, ym, dt = text, True, False, False
            while rest.strip():
                t = self._IVL_TERM_RE.match(rest)
                if not t:
                    ok = False
                    break
                num, unit = float(t.group(1)), t.group(2).lower().rstrip("s")
                if unit not in unit_of:
                    ok = False
                    break
                slot = unit_of[unit]
                if unit == "quarter":
                    num *= 3
                elif unit == "millisecond":
                    num /= 1e3
                elif unit == "microsecond":
                    num /= 1e6
                slots[slot] = slots[slot] + num
                ym |= slot in ("y", "mo")
                dt |= slot in ("w", "d", "h", "mi", "s")
                rest = rest[t.end():]
            if not ok or not (ym and dt):
                pos = m.end()
                continue
            args = ", ".join(
                str(int(slots[k])) if k != "s" else repr(slots["s"])
                for k in ("y", "mo", "w", "d", "h", "mi", "s")
            )
            repl = f"make_interval({args})"
            sql = sql[: m.start()] + repl + sql[m.end():]
            pos = m.start() + len(repl)

    _PM_INTERVAL_RE = re.compile(r"([+\-])\s*(?=INTERVAL\b)", re.I)

    def _rewrite_date_interval_widen(self, sql: str) -> str:
        """``X ± INTERVAL …`` (batch 28, temporal fuzzer): DuckDB widens
        a DATE operand to TIMESTAMP; Spark keeps DATE — the string
        forms silently diverge ('2023-12-01' vs '… 00:00:00'). The
        left operand gets CAST(AS TIMESTAMP) — a no-op for timestamps,
        the DuckDB type for dates. INTERVAL ± INTERVAL is left native
        (same semantics both engines)."""
        pos = 0
        while True:
            m = self._search_code(self._PM_INTERVAL_RE, sql, pos)
            if not m:
                return sql
            # operand scan-back (the AT TIME ZONE machinery's shape)
            end = m.start()
            while end > 0 and sql[end - 1].isspace():
                end -= 1
            i = end
            if i > 0 and sql[i - 1] == "'":
                i -= 1
                while i > 0 and sql[i - 1] != "'":
                    i -= 1
                i -= 1
                j = i
                while j > 0 and sql[j - 1].isspace():
                    j -= 1
                k = j
                while k > 0 and (sql[k - 1].isalnum() or sql[k - 1] == "_"):
                    k -= 1
                if k < j and re.fullmatch(
                    r"(?i)date|timestamp(tz|_s|_ms|_ns)?", sql[k:j]
                ):
                    i = k
                else:
                    pos = m.end() + 8  # a bare string ± interval: skip
                    continue
            elif i > 0 and sql[i - 1] in ")]":
                depth = 0
                while i > 0:
                    i -= 1
                    if sql[i] in ")]":
                        depth += 1
                    elif sql[i] in "([":
                        depth -= 1
                        if depth == 0:
                            break
                j = i
                while j > 0 and (sql[j - 1].isalnum() or sql[j - 1] in "_."):
                    j -= 1
                i = j
            else:
                while i > 0 and (sql[i - 1].isalnum() or sql[i - 1] in "_."):
                    i -= 1
            # absorb a preceding additive chain (DATE '…' + 5 - INTERVAL):
            # the ± operand is the whole chain, not its last atom
            while True:
                j = i
                while j > 0 and sql[j - 1].isspace():
                    j -= 1
                if j == 0 or sql[j - 1] not in "+-":
                    break
                j -= 1
                while j > 0 and sql[j - 1].isspace():
                    j -= 1
                k = j
                if k > 0 and sql[k - 1] == "'":
                    k -= 1
                    while k > 0 and sql[k - 1] != "'":
                        k -= 1
                    k -= 1
                    k2 = k
                    while k2 > 0 and sql[k2 - 1].isspace():
                        k2 -= 1
                    k3 = k2
                    while k3 > 0 and (sql[k3 - 1].isalnum() or sql[k3 - 1] == "_"):
                        k3 -= 1
                    if k3 < k2 and re.fullmatch(
                        r"(?i)date|timestamp(tz|_s|_ms|_ns)?", sql[k3:k2]
                    ):
                        k = k3
                    else:
                        break  # string-literal chain member: stop here
                elif k > 0 and sql[k - 1] in ")]":
                    depth = 0
                    while k > 0:
                        k -= 1
                        if sql[k] in ")]":
                            depth += 1
                        elif sql[k] in "([":
                            depth -= 1
                            if depth == 0:
                                break
                    k2 = k
                    while k2 > 0 and (sql[k2 - 1].isalnum() or sql[k2 - 1] in "_."):
                        k2 -= 1
                    k = k2
                else:
                    while k > 0 and (sql[k - 1].isalnum() or sql[k - 1] in "_."):
                        k -= 1
                if k == j:
                    break
                i = k
            operand = sql[i:end]
            if (
                not operand
                or re.match(r"(?i)^\s*interval\b", operand)
                or re.search(r"(?i)\binterval\s+('[^']*'|\d+)\s*\w*\s*$", sql[:i])
                # a reserved word before ± means the sign is UNARY
                # (SELECT -INTERVAL …, THEN -INTERVAL …): round-10
                # wave-4 catch — the scan-back grabbed 'SELECT' as the
                # operand and emitted an unparsable subtraction
                or operand.strip().lower() in self._ATOM_RESERVED
            ):
                pos = m.end() + 8
                continue
            # uq_poly: an INTERVAL-yielding operand (ts - ts chains)
            # can't cast to TIMESTAMP — the probe falls back native
            # (same semantics both engines there)
            repl = f"uq_poly(({operand}), CAST(({operand}) AS TIMESTAMP))"
            sql = sql[:i] + repl + sql[end:]
            pos = i + len(repl) + (m.end() - end) + 8

    _GLOB_TVF_RE = re.compile(r"(?i)\b(from|join)\s+glob\s*\(")

    def _rewrite_glob_tvf(self, sql: str) -> str:
        """DuckDB ``FROM glob('pattern')`` → inline VALUES of the
        matched paths (column ``file``, sorted — DuckDB's listing
        order). Driver-side resolution rides the same sandbox as every
        read_* path."""
        while True:
            hit = self._call_args(self._GLOB_TVF_RE, sql)
            if not hit:
                return sql
            m, close, args = hit
            if len(args) != 1:
                raise UQueryError.sql_error("glob expects one pattern")
            pat = self._lit_parse(args[0].strip())
            if pat is None:
                raise UQueryError.sql_error("glob: pattern must be a literal")
            self.check_path(pat)
            import glob as _glob

            files = sorted(_glob.glob(pat))
            # a user alias after the call (`FROM glob('p') g` / `g(file)`,
            # both DuckDB-accepted) replaces the synthetic one — a double
            # alias is a Spark parse error. Same stop-word scan as
            # _rewrite_information_schema.
            stop_words = {
                "on", "where", "group", "order", "limit", "join", "inner",
                "left", "right", "full", "cross", "union", "except",
                "intersect", "using", "having", "qualify", "offset",
                "fetch", "asof", "positional", "semi", "anti",
            }
            nxt = re.match(r"\s+(?:as\s+)?([A-Za-z_]\w*)", sql[close + 1 :])
            user_alias = bool(nxt) and nxt.group(1).lower() not in stop_words
            if files:
                rows = ", ".join(
                    "('" + f.replace("'", "''") + "')" for f in files
                )
                body = f"(VALUES {rows}) AS uq_glob(file)"
            else:
                body = (
                    "(SELECT CAST(NULL AS STRING) AS file WHERE false) "
                    "AS uq_glob"
                )
            if user_alias:
                # keep the column named `file` inside, let the user alias
                # bind to the derived table
                repl = f"{m.group(1)} (SELECT file FROM {body})"
            else:
                repl = f"{m.group(1)} {body}"
            sql = sql[: m.start()] + repl + sql[close + 1 :]

    # -- sweep batch 24: FETCH FIRST / typeof / from_json / array_slice -----

    _FETCH_COMBINED_RE = re.compile(
        r"(?i)\boffset\s+(\d+)\s+rows?\s+fetch\s+(?:first|next)\s*(\d*)\s*rows?\s+only"
    )
    _FETCH_RE = re.compile(r"(?i)\bfetch\s+(?:first|next)\s*(\d*)\s*rows?\s+only")
    _OFFSET_ROWS_RE = re.compile(r"(?i)\boffset\s+(\d+)\s+rows?\b")

    _ARRAY_SLICE_RE = re.compile(r"(?i)\b(array_slice|list_slice)\s*\(")

    def _rewrite_array_slice_fn(self, sql: str) -> str:
        """array_slice(l, a, b[, step]) → the bracket form (l)[a:b[:s]]
        (runs before the bracket pass; inherits its negative-index,
        step, and string-polymorphism handling). Also consumes the
        4-arg STEP form of list_slice (r13 wave-15 — previously a loud
        wrong-arity error); 3-arg list_slice stays with its own later
        pass (positive-inclusive slice(), no probe round-trip)."""
        pos = 0
        while True:
            hit = self._call_args(self._ARRAY_SLICE_RE, sql, pos)
            if not hit:
                return sql
            m, close, args = hit
            if m.group(1).lower() == "list_slice" and len(args) != 4:
                pos = m.end()
                continue
            if len(args) not in (3, 4):
                raise UQueryError.sql_error(
                    "array_slice expects (list, begin, end[, step])"
                )
            parts = ":".join(a.strip() for a in args[1:])
            repl = f"(({args[0]}))[{parts}]"
            sql = sql[: m.start()] + repl + sql[close + 1 :]
            pos = m.start() + len(repl)

    def _rewrite_fetch_first(self, sql: str) -> str:
        """SQL-standard ``FETCH FIRST/NEXT [n] ROWS ONLY`` → LIMIT, and
        ``OFFSET n ROWS`` → OFFSET n. The standard puts OFFSET before
        FETCH; Spark's grammar wants LIMIT before OFFSET — the combined
        form swaps them."""
        sql = self._sub_code_fn(
            self._FETCH_COMBINED_RE,
            lambda m: f"LIMIT {m.group(2) or '1'} OFFSET {m.group(1)}",
            sql,
        )
        sql = self._sub_code_fn(
            self._FETCH_RE, lambda m: f"LIMIT {m.group(1) or '1'}", sql
        )
        return self._sub_code_fn(
            self._OFFSET_ROWS_RE, lambda m: f"OFFSET {m.group(1)}", sql
        )

    @classmethod
    def _sub_code_fn(cls, pattern, fn, sql: str) -> str:
        """Callable substitution skipping string literals."""
        pos = 0
        while True:
            m = cls._search_code(pattern, sql, pos)
            if not m:
                return sql
            repl = fn(m)
            sql = sql[: m.start()] + repl + sql[m.end() :]
            pos = m.start() + len(repl)

    # Spark typename → DuckDB typename (uq_duck_typename UDF input)
    _TYPEOF_RE = re.compile(r"(?i)\btypeof\s*\(")

    _DUCK_TO_SPARK_TYPE = {
        "VARCHAR": "STRING", "BIGINT": "BIGINT", "UBIGINT": "BIGINT",
        "INTEGER": "INT", "UINTEGER": "BIGINT", "SMALLINT": "SMALLINT",
        "USMALLINT": "INT", "TINYINT": "TINYINT", "UTINYINT": "SMALLINT",
        "DOUBLE": "DOUBLE", "FLOAT": "FLOAT", "REAL": "FLOAT",
        "BOOLEAN": "BOOLEAN", "DATE": "DATE", "TIMESTAMP": "TIMESTAMP",
        "TIME": "STRING", "BLOB": "BINARY", "JSON": "STRING",
        "NULL": "STRING", "UUID": "STRING", "HUGEINT": "DECIMAL(38,0)",
    }

    @classmethod
    def _spark_schema_of(cls, v) -> str:
        """DuckDB json_structure-style type skeleton → Spark DDL type."""
        if isinstance(v, str):
            t = v.strip()
            if t.endswith("[]"):
                return f"ARRAY<{cls._spark_schema_of(t[:-2])}>"
            up = t.upper()
            if up.startswith("DECIMAL"):
                return up
            if up in cls._DUCK_TO_SPARK_TYPE:
                return cls._DUCK_TO_SPARK_TYPE[up]
            raise UQueryError.sql_error(f"from_json: unsupported type '{t}'")
        if isinstance(v, list):
            if len(v) != 1:
                raise UQueryError.sql_error(
                    "from_json: array structure must have one element type"
                )
            return f"ARRAY<{cls._spark_schema_of(v[0])}>"
        if isinstance(v, dict):
            fields = ", ".join(
                f"`{k}`: {cls._spark_schema_of(x)}" for k, x in v.items()
            )
            return f"STRUCT<{fields}>"
        raise UQueryError.sql_error("from_json: invalid structure literal")

    _FROM_JSON_RE = re.compile(r"(?i)\b(from_json|json_transform)\s*\(")

    def _rewrite_from_json(self, sql: str) -> str:
        """DuckDB ``from_json(j, structure)`` / ``json_transform`` →
        per-field try_variant_get over parse_json (round 11 — replaced
        the from_json emission, which silently yielded NULL for
        string-encoded scalars where DuckDB coerces: '{"a":"5"}' with
        a BIGINT target is 5 there). The structure literal translates
        to Spark DDL types ('{"a":"BIGINT"}' → '$\\.a' as BIGINT);
        JSON-'null' (and SQL NULL) input → NULL like DuckDB; malformed
        documents now ERROR like DuckDB (parse_json raises — the old
        PERMISSIVE struct-of-NULLs laxness is gone). Integer targets
        detour via DOUBLE + round() (DuckDB rounds 5.9→6, variant
        casting truncates); the same fractional corner nested inside
        containers still truncates (documented). Non-literal
        structures raise."""
        pos = 0
        while True:
            hit = self._call_args(self._FROM_JSON_RE, sql, pos)
            if not hit:
                return sql
            m, close, args = hit
            if len(args) != 2:
                raise UQueryError.sql_error(
                    f"{m.group(1)} expects (json, structure)"
                )
            struct_lit = self._lit_parse(args[1].strip())
            if struct_lit is None:
                raise UQueryError.sql_error(
                    f"{m.group(1)}: structure must be a string literal"
                )
            import json as _json

            try:
                schema = self._spark_schema_of(_json.loads(struct_lit))
            except UQueryError:
                raise
            except Exception as exc:
                raise UQueryError.sql_error(
                    f"{m.group(1)}: invalid structure: {exc}"
                ) from exc
            j = args[0]
            # Round 11 (wave-8 catch): Spark's from_json does NOT
            # coerce string-encoded scalars ('{"a":"5"}' with a BIGINT
            # → null — a SILENT wrong value; DuckDB yields 5), but
            # try_variant_get does, with DuckDB's exact lenient rules
            # (probed: "5"→5, "abc"→NULL, true→1, 7→'7', per-element
            # inside arrays). Top-level struct fields extract
            # per-field; integer targets detour via DOUBLE + round()
            # because DuckDB ROUNDS fractional→integer (5.9→6) where
            # variant casting truncates. Deviation (documented):
            # fractional→integer coercion nested INSIDE containers
            # still truncates (no per-element rounding hook).
            structure = _json.loads(struct_lit)
            var = f"parse_json(({j}))"
            int_types = {
                "TINYINT", "SMALLINT", "INTEGER", "INT", "BIGINT",
                "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT", "HUGEINT",
            }
            if isinstance(structure, dict):
                parts = []
                for k, tspec in structure.items():
                    path = "$." + k
                    fddl = self._spark_schema_of(tspec)
                    if isinstance(tspec, str) and tspec.strip().upper() in int_types:
                        # Detour via DOUBLE + round ONLY for fractional
                        # values (DuckDB rounds 5.9→6 where variant
                        # casting truncates); exact integers take the
                        # lossless bigint path — round(double) would
                        # silently lose precision above 2^53 (ADVICE
                        # r12: '{"a":9007199254740993}' with a BIGINT
                        # target). A non-numeric value makes the CASE
                        # condition NULL → falls to the bigint arm,
                        # which yields NULL like DuckDB.
                        vd = f"try_variant_get({var}, '{path}', 'double')"
                        fx = (
                            f"(CASE WHEN {vd} != floor({vd}) "
                            f"THEN CAST(round({vd}) AS {fddl}) "
                            f"ELSE CAST(try_variant_get({var}, '{path}', "
                            f"'bigint') AS {fddl}) END)"
                        )
                    else:
                        fx = f"try_variant_get({var}, '{path}', '{fddl}')"
                    parts.append(f"'{k}', {fx}")
                body = f"named_struct({', '.join(parts)})"
            else:
                body = f"try_variant_get({var}, '$', '{schema}')"
            repl = (
                f"(CASE WHEN ({j}) IS NULL OR trim(({j})) = 'null' "
                f"THEN CAST(NULL AS {schema}) "
                f"ELSE {body} END)"
            )
            sql = sql[: m.start()] + repl + sql[close + 1 :]
            pos = m.start() + len(repl)

    # -- sweep batch 22: printf / graphemes / AT TIME ZONE ------------------

    _PRINTF_RE = re.compile(r"(?i)\bprintf\s*\(")
    _B23_FN_RE = re.compile(
        r"(?i)\b(timezone|bar|bitstring|date_trunc|datetrunc|typeof|age)\s*\("
    )
    # DuckDB date_trunc returns DATE for day-and-coarser units (Spark is
    # always TIMESTAMP); units Spark's date_trunc lacks raise
    _TRUNC_DATE_UNITS = {"year", "quarter", "month", "week", "day"}
    _TRUNC_TS_UNITS = {
        "hour", "minute", "second", "millisecond", "microsecond",
        "milliseconds", "microseconds",
    }

    def _rewrite_b23_fns(self, sql: str) -> str:
        """Batch-23 sweep:

        - timezone(zone, ts) IS ``ts AT TIME ZONE zone`` → the same
          to_utc/from_utc mirror (1-arg timezone() still raises);
        - bar(x, min, max[, width=80]) → exact DuckDB rendering UDF
          (eighth blocks, byte-width space padding);
        - bitstring(s, n) → zero-pad (DuckDB errors when n < length —
          reproduced via raise_error). Partial support: the BIT type
          itself stays unsupported, this is the display form;
        - date_trunc/datetrunc with a literal day-or-coarser unit →
          CAST(... AS DATE) (DuckDB returns DATE there, Spark always
          TIMESTAMP — the string forms silently diverge otherwise);
          decade/century/millennium/isoyear/era raise (no Spark unit).
        """
        pos = 0
        while True:
            hit = self._call_args(self._B23_FN_RE, sql, pos)
            if not hit:
                return sql
            m, close, args = hit
            fn = m.group(1).lower()
            # nested batch-23 calls inside args translate first
            args = [self._rewrite_b23_fns(a) for a in args]
            if fn == "age":
                # batch 28: DuckDB/postgres calendar decomposition as
                # its DISPLAY STRING (DuckDB's mixed calendar INTERVAL
                # has no Spark type — string compare/display match,
                # interval arithmetic on the result fails loudly;
                # documented width deviation). 1-arg = vs current_date.
                if len(args) not in (1, 2):
                    raise UQueryError.sql_error("age expects 1 or 2 args")
                from .functions.parity_udfs import register_parity_udfs

                register_parity_udfs(self.spark)
                a0 = (
                    f"CAST(({args[0]}) AS TIMESTAMP)"
                    if len(args) == 2
                    else "CAST(current_date AS TIMESTAMP)"
                )
                a1 = f"CAST(({args[-1]}) AS TIMESTAMP)"
                repl = f"uq_age({a0}, {a1})"
                sql = sql[: m.start()] + repl + sql[close + 1 :]
                pos = m.start() + len(repl)
                continue
            if fn == "typeof":
                # batch 24: Spark typenames → DuckDB ('int' → INTEGER,
                # 'array<int>' → INTEGER[], struct/map recursively)
                if len(args) != 1:
                    raise UQueryError.sql_error("typeof expects 1 arg")
                from .functions.parity_udfs import register_parity_udfs

                register_parity_udfs(self.spark)
                repl = f"uq_duck_typename(typeof(({args[0]})))"
                sql = sql[: m.start()] + repl + sql[close + 1 :]
                pos = m.start() + len(repl)
                continue
            if fn == "timezone":
                if len(args) == 1:
                    # round 7: 1-arg timezone(ts) is the UTC-offset in
                    # SECONDS of the session zone — 0 in the UTC session
                    # this gateway pins (same shape as timezone_hour;
                    # NULL-propagating; DuckDB-probed). A string LITERAL
                    # arg is a binder error in DuckDB (timezone('UTC') —
                    # no VARCHAR overload): raise like it does.
                    if self._lit_parse(args[0].strip()) is not None:
                        raise UQueryError.sql_error(
                            "timezone(): no overload for a VARCHAR "
                            "argument (DuckDB binder error reproduced)"
                        )
                    repl = (
                        f"(CASE WHEN CAST(({args[0]}) AS TIMESTAMP) IS NULL "
                        f"THEN CAST(NULL AS BIGINT) ELSE 0 END)"
                    )
                    sql = sql[: m.start()] + repl + sql[close + 1 :]
                    pos = m.start() + len(repl)
                    continue
                if len(args) != 2:
                    raise UQueryError.sql_error(
                        "timezone() is only supported as timezone(zone, ts)"
                    )
                z, x = args
                tfn = (
                    "from_utc_timestamp"
                    if re.match(r"(?i)^\(*\s*to_utc_timestamp\s*\(", x)
                    else "to_utc_timestamp"
                )
                repl = f"{tfn}(({x}), ({z}))"
            elif fn == "bar":
                if len(args) not in (3, 4):
                    raise UQueryError.sql_error(
                        "bar expects (x, min, max[, width])"
                    )
                w = args[3] if len(args) == 4 else "80"
                from .functions.parity_udfs import register_parity_udfs

                register_parity_udfs(self.spark)
                repl = (
                    f"uq_bar(CAST(({args[0]}) AS DOUBLE), "
                    f"CAST(({args[1]}) AS DOUBLE), "
                    f"CAST(({args[2]}) AS DOUBLE), CAST(({w}) AS DOUBLE))"
                )
            elif fn == "bitstring":
                if len(args) != 2:
                    raise UQueryError.sql_error("bitstring expects (string, length)")
                s, n = args
                repl = (
                    f"(CASE WHEN length(({s})) > ({n}) THEN "
                    f"CAST(raise_error('bitstring: Length must be equal or "
                    f"larger than input string') AS STRING) "
                    f"ELSE lpad(({s}), CAST(({n}) AS INT), '0') END)"
                )
            else:  # date_trunc / datetrunc
                unit = (self._lit_parse(args[0].strip()) or "").lower() if args else ""
                if len(args) != 2 or not unit:
                    # non-literal unit: native pass-through (datetrunc renamed)
                    repl = f"date_trunc({', '.join(args)})"
                elif unit in self._TRUNC_DATE_UNITS:
                    repl = f"CAST(date_trunc('{unit}', ({args[1]})) AS DATE)"
                elif unit in self._TRUNC_TS_UNITS:
                    repl = f"date_trunc('{unit}', ({args[1]}))"
                else:
                    raise UQueryError.sql_error(
                        f"date_trunc: unit '{unit}' has no Spark equivalent"
                    )
            sql = sql[: m.start()] + repl + sql[close + 1 :]
            pos = m.start() + len(repl)
    _PRINTF_SPEC_RE = re.compile(r"%(?:(\d+)\$)?[-+ #0]*\d*(?:\.\d+)?([a-zA-Z%])")
    _SUBSTR_G_RE = re.compile(r"(?i)\bsubstring_grapheme\s*\(")
    _SPLIT_PART_RE = re.compile(r"(?i)\bsplit_part\s*\(")
    _AT_TZ_RE = re.compile(r"(?i)\bat\s+time\s+zone\s+('(?:[^']|'')*')")

    def _rewrite_b22_fns(self, sql: str) -> str:
        """Batch-22 sweep:

        - printf → format_string with spec-driven argument casts
          (DuckDB's fmt engine vs Java's Formatter): %d/%i/%x/%X/%o/%b
          args cast BIGINT (%i itself becomes %d — Java rejects it),
          %f/%e/%E args cast DOUBLE (Java rejects DECIMAL), %c casts
          INT; %g raises (C strips trailing zeros, Java does not —
          mistranslation would be silent); non-literal formats raise.
          Deviation: DuckDB is type-STRICT (%s with an int errors) —
          Java happily stringifies, so we are laxer, never wrong-valued;
        - substring_grapheme → grapheme-cluster UDFs with DuckDB's
          substring window rules (negative start from the end, negative
          length takes the window before);
        - split_part with a LITERAL index 0 → '' (DuckDB returns
          empty; Spark raises). A runtime 0 still raises — loud, never
          silent;
        - ``x AT TIME ZONE 'z'`` → to_utc_timestamp (naive wall time in
          z → instant), and the chained tstz form
          ``(x AT TIME ZONE 'a') AT TIME ZONE 'b'`` → from_utc ∘ to_utc
          (wall-time conversion between zones). Display deviation:
          DuckDB renders the single-application TIMESTAMPTZ result with
          a '+00' suffix in a UTC session — compare via epoch or CAST.
        """
        while True:
            hit = self._call_args(self._PRINTF_RE, sql)
            if not hit:
                break
            m, close, args = hit
            if not args or not (args[0].startswith("'") and args[0].endswith("'")):
                raise UQueryError.sql_error(
                    "printf: only literal format strings are supported"
                )
            fmt = args[0][1:-1]
            casts = []
            g_spans = []  # (start, end, full_spec) of %g/%G occurrences
            for sm in self._PRINTF_SPEC_RE.finditer(fmt):
                conv = sm.group(2)
                if conv == "%":
                    continue
                if sm.group(1):
                    raise UQueryError.sql_error(
                        "printf: positional specifiers are not supported"
                    )
                if conv in ("g", "G"):
                    # round 7: %g graduates from raise — rendered by
                    # uq_fmt_g (Python %-format IS C printf: strips
                    # trailing zeros where Java's %g keeps them); the
                    # spec becomes %s in the Java format string and the
                    # full C spec travels to the UDF verbatim
                    casts.append("UQ_G:" + sm.group(0))
                    g_spans.append((sm.start(), sm.end()))
                    continue
                if conv not in "dioxXbeEfFsc":
                    raise UQueryError.sql_error(f"printf: unsupported %{conv}")
                casts.append(
                    {
                        "d": "BIGINT", "i": "BIGINT", "o": "BIGINT",
                        "x": "BIGINT", "X": "BIGINT", "b": "BIGINT",
                        "e": "DOUBLE", "E": "DOUBLE", "f": "DOUBLE",
                        "F": "DOUBLE", "c": "INT", "s": None,
                    }[conv]
                )
            for start, end in reversed(g_spans):
                fmt = fmt[:start] + "%s" + fmt[end:]
            fmt = re.sub(r"%([-+ #0]*\d*(?:\.\d+)?)i", r"%\1d", fmt)
            vals = args[1:]
            if len(vals) != len(casts):
                raise UQueryError.sql_error(
                    f"printf: format has {len(casts)} specifier(s) but "
                    f"{len(vals)} argument(s) were passed"
                )
            if g_spans:
                from .functions.parity_udfs import register_parity_udfs

                register_parity_udfs(self.spark)

            def _arg(v, c):
                if isinstance(c, str) and c.startswith("UQ_G:"):
                    spec = c[5:].replace("'", "''")
                    return f"uq_fmt_g(CAST(({v}) AS DOUBLE), '{spec}')"
                return f"CAST(({v}) AS {c})" if c else f"({v})"

            out = [f"'{fmt}'"] + [_arg(v, c) for v, c in zip(vals, casts)]
            sql = sql[: m.start()] + f"format_string({', '.join(out)})" + sql[close + 1 :]
        while True:
            hit = self._call_args(self._SUBSTR_G_RE, sql)
            if not hit:
                break
            m, close, args = hit
            if len(args) == 2:
                repl = f"uq_substr_grapheme2(({args[0]}), CAST(({args[1]}) AS INT))"
            elif len(args) == 3:
                repl = (
                    f"uq_substr_grapheme3(({args[0]}), "
                    f"CAST(({args[1]}) AS INT), CAST(({args[2]}) AS INT))"
                )
            else:
                raise UQueryError.sql_error(
                    "substring_grapheme expects (string, start[, length])"
                )
            from .functions.parity_udfs import register_parity_udfs

            register_parity_udfs(self.spark)
            sql = sql[: m.start()] + repl + sql[close + 1 :]
        pos = 0
        while True:
            hit = self._call_args(self._SPLIT_PART_RE, sql, pos)
            if not hit:
                break
            m, close, args = hit
            if len(args) == 3 and args[2].strip() == "0":
                sql = sql[: m.start()] + "''" + sql[close + 1 :]
                pos = m.start()
            else:
                pos = m.end()
        while True:
            m = self._search_code(self._AT_TZ_RE, sql)
            if not m:
                return sql
            zone = m.group(1)
            end = m.start()
            while end > 0 and sql[end - 1].isspace():
                end -= 1
            i = end
            if i > 0 and sql[i - 1] == "'":
                # a literal operand: TIMESTAMP '…' / DATE '…'
                i -= 1
                while i > 0 and sql[i - 1] != "'":
                    i -= 1
                i -= 1
                j = i
                while j > 0 and sql[j - 1].isspace():
                    j -= 1
                k = j
                while k > 0 and (sql[k - 1].isalnum() or sql[k - 1] == "_"):
                    k -= 1
                if k < j and re.fullmatch(r"(?i)timestamp(tz)?|date", sql[k:j]):
                    i = k
            elif i > 0 and sql[i - 1] == ")":
                depth = 0
                while i > 0:
                    i -= 1
                    if sql[i] == ")":
                        depth += 1
                    elif sql[i] == "(":
                        depth -= 1
                        if depth == 0:
                            break
                j = i
                while j > 0 and (sql[j - 1].isalnum() or sql[j - 1] in "_."):
                    j -= 1
                i = j
            else:
                while i > 0 and (sql[i - 1].isalnum() or sql[i - 1] in "_."):
                    i -= 1
            operand = sql[i:end]
            if not operand:
                raise UQueryError.sql_error("AT TIME ZONE: missing operand")
            fn = (
                "from_utc_timestamp"
                if re.match(r"(?i)^\(*\s*to_utc_timestamp\s*\(", operand)
                else "to_utc_timestamp"
            )
            sql = sql[:i] + f"{fn}({operand}, {zone})" + sql[m.end() :]

    # -- sweep batch 21: the JSON tail --------------------------------------

    # NB: longer names that share prefixes (json_array_length, json_keys,
    # json_extract…) can't match — every alternative requires '(' right
    # after the name. json_array_length is natively identical (verified).
    _B21_JSON_RE = re.compile(
        r"(?i)(?<![\w.])(json_object|json_array|json_quote|"
        r"json_merge_patch|json_structure|json_type|json_contains|"
        r"json_group_structure|json_group_array|json_group_object|"
        r"row_to_json|json)\s*\("
    )
    _JSON_OPTS = "map('ignoreNullFields', 'false')"

    # calls whose RESULT is already JSON text — nested inside another
    # batch-21 constructor they splice raw instead of re-encoding as a
    # quoted string (DuckDB's JSON logical type nests structurally)
    _B21_PRODUCER_RE = re.compile(
        r"(?i)^[\s(]*(json_object|json_array|json_quote|json_merge_patch|"
        r"json_group_array|json_group_object|row_to_json|json)\s*\("
    )

    def _jenc(self, v: str) -> str:
        """Scalar→JSON text via Spark's own to_json writer: encode
        named_struct('x', v) (constant '{"x":' prefix, 5 chars) and slice
        the value out. NULL encodes as 'null' (ignoreNullFields off).
        Matches DuckDB's yyjson output for strings/numbers/bools/dates/
        lists/structs; TIMESTAMP args deviate (ISO 'T' form vs DuckDB's
        space-separated) — cast to VARCHAR first for byte parity."""
        tj = f"to_json(named_struct('x', ({v})), {self._JSON_OPTS})"
        return f"substr({tj}, 6, length({tj}) - 6)"

    def _jenc_val(self, raw_arg: str, translated: str) -> str:
        """JSON-encode a value position: a nested batch-21 producer is
        already JSON text and splices raw (SQL NULL → 'null' to keep the
        element, like DuckDB); anything else goes through the encoder.
        (Limitation: json_extract results — translated before this pass
        runs — re-encode as strings; cast via ->> for raw splicing.)"""
        if self._B21_PRODUCER_RE.match(raw_arg):
            return f"coalesce(({translated}), 'null')"
        return self._jenc(translated)

    def _rewrite_b21_json(self, sql: str) -> str:
        """Batch-21 sweep — DuckDB's json extension tail (semantics
        probed on DuckDB 1.0, pinned in tests/test_parity_udfs.py):

        - json_object: pairwise; a NULL KEY drops the pair (→ '{}'),
          duplicate keys are KEPT, non-literal keys work (encoded via
          CAST AS STRING); NULL values encode as null;
        - json_array: positional, NULL → 'null', empty → '[]';
        - json_quote: scalar/compound encode, SQL NULL → NULL (not
          'null' — DuckDB-verified asymmetry vs json_array);
        - row_to_json: struct encode (same writer);
        - json(x): minify round-trip (UDF; malformed raises like
          DuckDB);
        - json_merge_patch: RFC 7386 left-fold for n args, strict on
          SQL NULL;
        - json_structure: type skeleton (UBIGINT/BIGINT/DOUBLE widening,
          NULL wildcard, object key union, conflict → "JSON");
        - json_type: 1- and 2-arg (path: $-JSONPath subset, JSON
          Pointer, bare key; missing path → NULL);
        - json_contains: recursive containment (object subset, array
          set-containment, scalar descent);
        - json_group_array/json_group_object: aggregate forms over
          collect_list / map_from_entries (array form keeps NULLs as
          'null'; element order is input order on both engines — at
          32-partition scale Spark's order is partition order, same
          caveat as 1-arg string_agg);
        - json_array_length: rename (both count top-level elements).
        """
        hit = self._call_args(self._B21_JSON_RE, sql)
        if not hit:
            return sql
        from .functions.parity_udfs import register_parity_udfs

        register_parity_udfs(self.spark)
        while hit:
            m, close, raw_args = hit
            fn = m.group(1).lower()
            raw_args = [a for a in raw_args if a]
            # nested batch-21 calls inside args translate first (the
            # outer scan skips past the emitted replacement text)
            args = [self._rewrite_b21_json(a) for a in raw_args]
            if fn == "json_object":
                if len(args) % 2:
                    raise UQueryError.sql_error(
                        "json_object expects an even number of arguments"
                    )
                pairs = [
                    f"CASE WHEN ({k}) IS NULL THEN NULL ELSE "
                    f"concat({self._jenc(f'CAST(({k}) AS STRING)')}, ':', "
                    f"{self._jenc_val(rv, v)}) END"
                    for (k, v, rv) in zip(args[::2], args[1::2], raw_args[1::2])
                ]
                body = f"concat_ws(',', {', '.join(pairs)})" if pairs else "''"
                repl = f"concat('{{', {body}, '}}')"
            elif fn == "json_array":
                body = (
                    "concat_ws(',', "
                    + ", ".join(
                        self._jenc_val(r, a) for r, a in zip(raw_args, args)
                    )
                    + ")"
                    if args
                    else "''"
                )
                repl = f"concat('[', {body}, ']')"
            elif fn in ("json_quote", "row_to_json"):
                if len(args) != 1:
                    raise UQueryError.sql_error(f"{fn} expects 1 arg")
                repl = (
                    f"(CASE WHEN ({args[0]}) IS NULL THEN CAST(NULL AS STRING) "
                    f"ELSE {self._jenc(args[0])} END)"
                )
            elif fn == "json":
                if len(args) != 1:
                    raise UQueryError.sql_error("json expects 1 arg")
                repl = f"uq_json_minify(({args[0]}))"
            elif fn == "json_merge_patch":
                if len(args) < 2:
                    raise UQueryError.sql_error(
                        "json_merge_patch expects at least 2 args"
                    )
                repl = f"({args[0]})"
                for a in args[1:]:
                    repl = f"uq_json_merge_patch({repl}, ({a}))"
            elif fn == "json_structure":
                repl = f"uq_json_structure(({args[0]}))"
            elif fn == "json_type":
                if len(args) == 1:
                    repl = f"uq_json_type1(({args[0]}))"
                elif len(args) == 2:
                    repl = f"uq_json_type2(({args[0]}), ({args[1]}))"
                else:
                    raise UQueryError.sql_error("json_type expects 1 or 2 args")
            elif fn == "json_contains":
                if len(args) != 2:
                    raise UQueryError.sql_error(
                        "json_contains expects (haystack, needle)"
                    )
                repl = f"uq_json_contains(({args[0]}), ({args[1]}))"
            elif fn == "json_group_structure":
                if len(args) != 1:
                    raise UQueryError.sql_error(
                        "json_group_structure expects 1 arg"
                    )
                # Per-row structure extraction runs map-side; only
                # DISTINCT structure strings (bounded by schema
                # complexity, not rows — merge is commutative/
                # associative/idempotent, so collect_set is sound)
                # reach the final fold. Parse semantics — consistent
                # with json_structure and an explicit ::JSON cast;
                # DuckDB 1.0.0's bare-VARCHAR aggregate wraps the text
                # as a JSON string scalar instead (probed '"VARCHAR"'),
                # inconsistent with its own scalar function — the
                # oracle entry pins through ::JSON where all versions
                # parse. Empty/all-NULL group → NULL like DuckDB.
                repl = (
                    f"uq_json_structs_merge(collect_set("
                    f"uq_json_structure(CAST(({args[0]}) AS STRING))))"
                )
            elif fn == "json_group_array":
                if len(args) != 1:
                    raise UQueryError.sql_error("json_group_array expects 1 arg")
                # empty group → NULL (DuckDB's macro is string_agg-based)
                cl = f"collect_list({self._jenc_val(raw_args[0], args[0])})"
                repl = (
                    f"IF(size({cl}) = 0, CAST(NULL AS STRING), "
                    f"concat('[', concat_ws(',', {cl}), ']'))"
                )
            else:  # json_group_object
                if len(args) != 2:
                    raise UQueryError.sql_error(
                        "json_group_object expects (key, value)"
                    )
                k, v = args
                cl = f"collect_list(struct(CAST(({k}) AS STRING) AS k, ({v}) AS v))"
                repl = (
                    f"IF(size({cl}) = 0, CAST(NULL AS STRING), "
                    f"to_json(map_from_entries({cl}), {self._JSON_OPTS}))"
                )
            sql = sql[: m.start()] + repl + sql[close + 1 :]
            hit = self._call_args(self._B21_JSON_RE, sql, m.start() + len(repl))
        return sql

    # -- sweep batch 20 -----------------------------------------------------

    # 2!..33! — DuckDB's factorial range is HUGEINT (int128): 33! is the
    # last value that fits, 34! raises Out of Range. DECIMAL(38,0) holds
    # all of them (33! has 37 digits).
    _FACTORIALS = [str(__import__("math").factorial(n)) for n in range(2, 34)]
    _LIST_DISTINCT_RE = re.compile(r"(?i)\b(?:list|array)_distinct\s*\(")

    def _rewrite_list_distinct(self, sql: str) -> str:
        """DuckDB list_distinct/array_distinct REMOVE NULL elements
        (list_distinct([5,NULL,7,NULL]) = [7,5], list_distinct([NULL])
        = [] — probed; nested-fuzzer catch round 7) where Spark's
        array_distinct keeps one NULL → filter first. Runs BEFORE the
        passes that emit Spark's native array_distinct internally
        (entropy/histogram/jaccard translations — their NULL handling
        was probed per-function and must stay untouched). Element
        order remains a documented deviation (both engines:
        implementation-defined)."""
        pos = 0
        while True:
            hit = self._call_args(self._LIST_DISTINCT_RE, sql, pos)
            if not hit:
                return sql
            m, close, args = hit
            if len(args) != 1:
                raise UQueryError.sql_error("list_distinct expects 1 arg")
            # recurse into the argument FIRST: the scan skips past the
            # whole replacement, so a NESTED list_distinct inside it
            # stayed untranslated (round-10 nested-fuzzer catch, seed
            # 660002: list_distinct(list_sort(list_distinct(..))) —
            # loud UNRESOLVED_ROUTINE on the inner call)
            inner = self._rewrite_list_distinct(args[0])
            repl = (
                f"array_distinct(filter(({inner}), "
                f"uq_ld -> uq_ld IS NOT NULL))"
            )
            sql = sql[: m.start()] + repl + sql[close + 1 :]
            pos = m.start() + len(repl)

    _LIST_ZIP_RE = re.compile(r"(?i)\b(?:list|array)_zip\s*\(")

    def _rewrite_list_zip(self, sql: str) -> str:
        """list_zip/array_zip → transform over an index sequence into
        named_structs with DuckDB's field names (list_1..list_n;
        arrays_zip would name them 0/1 — probed). NULL-pads to the
        LONGEST list (a NULL list contributes NULLs but no length);
        a literal trailing true/false is DuckDB's truncate flag →
        least() of the sizes instead. slice(…, 1, n) handles the
        empty result (Spark sequence(1, 0) would count DOWN).

        Known schema deviation (documented, like the unnamed-struct
        note): a LITERAL NULL list's struct field is emitted as
        CAST(NULL AS STRING) — Spark's bare NULL is VOID-typed and
        there is no expression context at rewrite time to derive the
        element type DuckDB's binder would infer. Values match DuckDB
        exactly (all NULL); only the field's declared type diverges
        for non-string sibling lists (ADVICE r13)."""
        pos = 0
        while True:
            hit = self._call_args(self._LIST_ZIP_RE, sql, pos)
            if not hit:
                return sql
            m, close, args = hit
            if not args or not args[0].strip():
                raise UQueryError.sql_error("list_zip expects at least 1 list")
            args = [self._rewrite_list_zip(a) for a in args]
            agg, trunc = "greatest", False
            last = args[-1].strip().lower()
            if last in ("true", "false"):
                trunc = last == "true"
                args = args[:-1]
                if trunc:
                    agg = "least"
                if not args:
                    raise UQueryError.sql_error(
                        "list_zip expects at least 1 list"
                    )
            def _is_null_lit(a: str) -> bool:
                return a.strip().upper() == "NULL"

            # a literal NULL list contributes NULLs but no length
            # (DuckDB-probed: list_zip([1,2], NULL) → 2 null-padded
            # entries); its bare NULL is VOID-typed in Spark, which
            # size()/element_at() reject at analysis
            size_terms = [
                "0" if _is_null_lit(a) else f"coalesce(size(({a})), 0)"
                for a in args
            ]
            n = f"{agg}({', '.join(size_terms)})" if len(args) > 1 else size_terms[0]
            fields = ", ".join(
                f"'list_{i + 1}', "
                + (
                    "CAST(NULL AS STRING)"
                    if _is_null_lit(a)
                    else f"try_element_at(({a}), uq_zi)"
                )
                for i, a in enumerate(args)
            )
            repl = (
                f"slice(transform(sequence(1, greatest(1, {n})), "
                f"uq_zi -> named_struct({fields})), 1, {n})"
            )
            sql = sql[: m.start()] + repl + sql[close + 1 :]
            pos = m.start() + len(repl)

    _MAP_CONCAT_RE = re.compile(r"(?i)\bmap_concat\s*\(")

    def _rewrite_map_concat(self, sql: str) -> str:
        """DuckDB map_concat keeps the LAST value for a duplicated key
        AT THE FIRST map's key position (probed: map_concat({'a':1},
        {'b':2,'a':9}) renders keys [a, b] with a=9) where Spark's
        raises DUPLICATED_MAP_KEY (round-12 wave-11 — a loud error on
        DuckDB-valid input) → left fold of a 2-map combine: the left
        map's colliding VALUES are overwritten in place
        (transform_values keeps key order), then only the right map's
        NEW keys append (ADVICE r13 — the earlier filter-left emission
        re-positioned colliding keys at the right map's slot, a
        rendered-key-order divergence). Single-arg calls pass through;
        repeated operand references collapse under Catalyst CSE."""
        pos = 0
        while True:
            hit = self._call_args(self._MAP_CONCAT_RE, sql, pos)
            if not hit:
                return sql
            m, close, args = hit
            if len(args) < 2:
                pos = m.end()
                continue
            args = [self._rewrite_map_concat(a) for a in args]
            repl = args[0]
            for b in args[1:]:
                repl = (
                    f"map_concat(transform_values(({repl}), (uq_mk, uq_mv) -> "
                    f"IF(array_contains(map_keys(({b})), uq_mk), "
                    f"try_element_at(({b}), uq_mk), uq_mv)), "
                    f"map_filter(({b}), (uq_mk, uq_mv) -> "
                    f"NOT array_contains(map_keys(({repl})), uq_mk)))"
                )
            sql = sql[: m.start()] + repl + sql[close + 1 :]
            pos = m.start() + len(repl)

    _B20_FN_RE = re.compile(
        r"(?i)\b(flatten|factorial|trunc|list_contains|array_contains|"
        r"list_position|list_indexof|array_indexof|"
        r"list_append|list_prepend|"
        r"setseed|current_setting)\s*\("
    )
    # postfix factorial: operand ends with \w / ) / ] and the '!' is not
    # part of != / !~ (operator-symbols has consumed !~ by this point)
    _BANG_RE = re.compile(r"(?<=[\w)\]])\s*!(?![=~])")

    def _factorial_case(self, n: str) -> str:
        lut = ", ".join(f"CAST('{v}' AS DECIMAL(38,0))" for v in self._FACTORIALS)
        return (
            f"(CASE WHEN ({n}) IS NULL THEN CAST(NULL AS DECIMAL(38,0)) "
            f"WHEN ({n}) > 33 THEN CAST(raise_error('factorial: value out of "
            f"range') AS DECIMAL(38,0)) "
            f"WHEN ({n}) <= 1 THEN CAST(1 AS DECIMAL(38,0)) "
            f"ELSE element_at(array({lut}), CAST(({n}) AS INT) - 1) END)"
        )

    def _rewrite_b20_postfix_bang(self, sql: str) -> str:
        """DuckDB postfix ``n!`` = factorial (5! = 120). Runs after the
        operator-symbols pass so ``!~`` is already consumed; ``!=`` is
        excluded by lookahead. The operand is the preceding atom
        (number / identifier chain / balanced group); a fractional
        numeric literal raises like DuckDB's binder does."""
        while True:
            m = self._search_code(self._BANG_RE, sql)
            if not m:
                return sql
            end = m.start()
            while end > 0 and sql[end - 1].isspace():
                end -= 1
            i = end
            if i > 0 and sql[i - 1] in ")]":
                depth = 0
                while i > 0:
                    i -= 1
                    if sql[i] in ")]":
                        depth += 1
                    elif sql[i] in "([":
                        depth -= 1
                        if depth == 0:
                            break
                # include a preceding function name, if any
                j = i
                while j > 0 and (sql[j - 1].isalnum() or sql[j - 1] in "_."):
                    j -= 1
                i = j
            else:
                while i > 0 and (sql[i - 1].isalnum() or sql[i - 1] in "_."):
                    i -= 1
            operand = sql[i:end]
            if not operand:
                raise UQueryError.sql_error("'!': missing operand for factorial")
            if re.fullmatch(r"\d+\.\d+", operand):
                raise UQueryError.sql_error(
                    "factorial (!) requires an integer operand"
                )
            sql = sql[:i] + f"factorial({operand})" + sql[m.end() :]

    def _rewrite_b20_fns(self, sql: str) -> str:
        """Batch-20 sweep:

        - flatten: DuckDB SKIPS NULL sublists (flatten([[1],NULL,[2]]) =
          [1,2]) where Spark returns NULL → filter first (null ELEMENTS
          inside sublists are kept by both);
        - factorial / postfix ``!`` → DECIMAL(38,0) lookup (DuckDB:
          HUGEINT; n<=1 → 1 incl. negatives, n>33 raises — all
          DuckDB-verified). Width deviation: DECIMAL vs HUGEINT, same
          digits;
        - 1-arg trunc → CASE floor/ceil (Spark trunc is date-only;
          toward-zero truncation verified incl. negatives). Type
          deviation: DOUBLE input yields BIGINT (DuckDB keeps DOUBLE) —
          same value; 2-arg calls stay native (Spark date trunc);
        - list_contains/array_contains: DuckDB returns FALSE when the
          value is absent from a null-bearing list and NULL for a NULL
          needle; Spark's three-valued array_contains returns NULL for
          both → CASE + coalesce(..., false) (the ifnull on the needle
          types untyped NULL literals; the CASE short-circuits before it
          matters);
        - setseed → typed-NULL no-op (random() is documented
          engine-specific — seeding cannot carry across engines);
        - current_setting raises (engine-specific configuration keys).
        """
        sql = self._rewrite_b20_postfix_bang(sql)
        pos = 0
        while True:
            hit = self._call_args(self._B20_FN_RE, sql, pos)
            if not hit:
                return sql
            m, close, args = hit
            fn = m.group(1).lower()
            # nested batch-20 calls inside the args translate first; the
            # scan then skips past the emitted text (which re-uses
            # flatten/array_contains names)
            args = [self._rewrite_b20_fns(a) for a in args]
            a0 = args[0] if args else ""
            if fn == "current_setting":
                raise UQueryError.sql_error(
                    "current_setting() is engine-specific and not supported"
                )
            if fn == "flatten":
                if len(args) != 1:
                    raise UQueryError.sql_error("flatten expects 1 arg")
                repl = f"flatten(filter(({a0}), uq_fl -> uq_fl IS NOT NULL))"
            elif fn == "factorial":
                if len(args) != 1:
                    raise UQueryError.sql_error("factorial expects 1 arg")
                repl = self._factorial_case(a0)
            elif fn == "trunc":
                if len(args) != 1:
                    pos = m.end()  # Spark's own date trunc(date, fmt)
                    continue
                repl = (
                    f"(CASE WHEN ({a0}) >= 0 THEN floor(({a0})) "
                    f"ELSE ceil(({a0})) END)"
                )
            elif fn in ("list_position", "list_indexof", "array_indexof"):
                if len(args) != 2:
                    raise UQueryError.sql_error(f"{fn} expects (list, value)")
                a, x = a0, args[1]
                # DuckDB coerces the needle's numeric width; Spark's
                # array_position is type-strict (fuzzer catch, batch
                # 28). The native form probes first; mismatched widths
                # fall back to the both-sides-widened form.
                # DOUBLE on both sides: Spark demands EXACT type match
                # down to decimal precision; arithmetic re-unification
                # still disagreed (probed) — the double cast is the
                # only stable meeting point for mixed numerics
                widened = (
                    f"array_position("
                    f"transform(({a}), uq_pe -> CAST(uq_pe AS DOUBLE)), "
                    f"CAST(({x}) AS DOUBLE))"
                )
                repl = f"uq_poly({widened}, array_position(({a}), ({x})))"
            elif fn in ("list_append", "list_prepend"):
                if len(args) != 2:
                    raise UQueryError.sql_error(f"{fn} expects 2 args")
                # DuckDB coerces numeric widths; Spark's array_append/
                # prepend are type-strict (nested-fuzzer catch) —
                # native probes first, mixed widths fall back to
                # both-sides-DOUBLE
                if fn == "list_append":
                    a, x, out = a0, args[1], "array_append"
                else:
                    x, a, out = a0, args[1], "array_prepend"
                widened = (
                    f"{out}(transform(({a}), uq_pe -> CAST(uq_pe AS DOUBLE)), "
                    f"CAST(({x}) AS DOUBLE))"
                )
                repl = f"uq_poly({widened}, {out}(({a}), ({x})))"
            elif fn == "setseed":
                repl = "CAST(NULL AS DOUBLE)"
            else:  # list_contains / array_contains
                if len(args) != 2:
                    raise UQueryError.sql_error(f"{fn} expects (list, value)")
                a, x = a0, args[1]
                # the ifnull wrappers only TYPE untyped NULL literals
                # (either side) — the CASE short-circuits before they
                # could change a value
                ta = f"ifnull(({a}), array(({x})))"
                repl = (
                    f"(CASE WHEN ({x}) IS NULL OR ({a}) IS NULL "
                    f"THEN CAST(NULL AS BOOLEAN) "
                    f"ELSE coalesce(array_contains({ta}, "
                    f"ifnull(({x}), try_element_at({ta}, 1))), false) END)"
                )
            sql = sql[: m.start()] + repl + sql[close + 1 :]
            pos = m.start() + len(repl)

    # -- sweep batch 19 -----------------------------------------------------

    _B19_LIST_AGG_ALIAS = {
        "list_sum": "sum",
        "list_avg": "avg",
        "list_count": "count",
    }
    _B19_LIST_ALIAS_RE = re.compile(r"(?i)\b(list_sum|list_avg|list_count)\s*\(")
    _B19_FN_RE = re.compile(
        r"(?i)\b(generate_subscripts|list_resize|list_any_value|list_first|"
        r"list_last|list_median|list_mode|array_pop_back|array_pop_front)\s*\("
    )
    _DATE_ADD_RE = re.compile(r"(?i)\bdate_add\s*\(")

    def _rewrite_b19_fns(self, sql: str) -> str:
        """Batch-19 sweep — list-function family + friends:

        - list_sum/avg/count → the list_aggregate machinery (same
          NULL-skipping folds);
        - list_first/last = FIRST/LAST element INCLUDING NULLs
          (DuckDB-verified: list_first([NULL,2]) is NULL) →
          try_element_at at 1 / max(size,1);
        - list_any_value = first NON-null;
        - list_resize(l, n[, fill]) → slice + array_repeat pad
          (truncates when n < size, like DuckDB);
        - list_median → the interpolated median expression over the
          non-null DOUBLE-cast sort (decimal-element lists keep the
          documented decimal-median deviation);
        - list_mode → argmax by (count, then SMALLEST value) — tie
          order is engine-unspecified in DuckDB (like mode());
        - array_pop_back/front → guarded slices;
        - generate_subscripts(a, 1) → explode(sequence(1, size)) —
          dim >= 2 raises in DuckDB itself;
        - regexp_escape → RE2-QuoteMeta-style class escape (ASCII
          non-word chars; astral-plane chars additionally escaped —
          harmless width of the Java regex class, documented);
        - date_add(x, INTERVAL …) → timestamp + interval (DuckDB
          returns TIMESTAMP; the int-days form stays native).
        """
        pos = 0
        while True:
            hit = self._call_args(self._B19_LIST_ALIAS_RE, sql, pos)
            if not hit:
                break
            m, close, args = hit
            if len(args) != 1:
                raise UQueryError.sql_error(f"{m.group(1)} expects 1 arg")
            agg = self._B19_LIST_AGG_ALIAS[m.group(1).lower()]
            repl = f"list_aggregate(({args[0]}), '{agg}')"
            sql = sql[: m.start()] + repl + sql[close + 1 :]
            pos = m.start()
        pos = 0
        while True:
            hit = self._call_args(self._DATE_ADD_RE, sql, pos)
            if not hit:
                break
            m, close, args = hit
            if len(args) != 2 or not re.match(r"(?i)^interval\b", args[1]):
                pos = m.end()  # Spark's own (date, int) form — native
                continue
            repl = f"(CAST(({args[0]}) AS TIMESTAMP) + {args[1]})"
            sql = sql[: m.start()] + repl + sql[close + 1 :]
            pos = m.start() + len(repl)
        while True:
            hit = self._call_args(self._B19_FN_RE, sql)
            if not hit:
                return sql
            m, close, args = hit
            fn = m.group(1).lower()
            a0 = args[0]
            if fn == "generate_subscripts":
                if len(args) != 2 or args[1].strip() != "1":
                    raise UQueryError.sql_error(
                        "generate_subscripts: only dimension 1 is supported "
                        "(DuckDB raises beyond it too)"
                    )
                repl = f"explode(sequence(1, size(({a0}))))"
            elif fn == "list_resize":
                if len(args) not in (2, 3):
                    raise UQueryError.sql_error(
                        "list_resize expects (list, size[, fill])"
                    )
                n = f"CAST(({args[1]}) AS INT)"
                fill = (
                    f"({args[2]})"
                    if len(args) == 3
                    else f"(CASE WHEN false THEN try_element_at(({a0}), 1) END)"
                )
                # list_concat, not concat: the batch-8 concat pass
                # downstream stringifies bare concat() calls
                repl = (
                    f"list_concat(slice(({a0}), 1, least({n}, size(({a0})))), "
                    f"array_repeat({fill}, greatest({n} - size(({a0})), 0)))"
                )
            elif fn == "list_any_value":
                repl = f"try_element_at(filter(({a0}), uq_le -> uq_le IS NOT NULL), 1)"
            elif fn == "list_first":
                repl = f"try_element_at(({a0}), 1)"
            elif fn == "list_last":
                repl = f"try_element_at(({a0}), greatest(size(({a0})), 1))"
            elif fn == "list_median":
                arr = (
                    f"array_sort(transform(filter(({a0}), "
                    f"uq_le -> uq_le IS NOT NULL), uq_mv -> CAST(uq_mv AS DOUBLE)))"
                )
                repl = (
                    f"(CASE WHEN size({arr}) = 0 THEN NULL "
                    f"ELSE ({self._median_of(arr)}) END)"
                )
            elif fn == "list_mode":
                nn = f"filter(({a0}), uq_le -> uq_le IS NOT NULL)"
                repl = (
                    f"try_element_at(array_sort(transform(array_distinct({nn}), "
                    f"uq_v -> struct(0 - size(filter({nn}, uq_e2 -> uq_e2 = uq_v)) AS c, "
                    f"uq_v AS v))), 1).v"
                )
            elif fn == "array_pop_back":
                repl = f"slice(({a0}), 1, greatest(size(({a0})) - 1, 0))"
            else:  # array_pop_front
                repl = f"slice(({a0}), 2, greatest(size(({a0})) - 1, 0))"
            sql = sql[: m.start()] + repl + sql[close + 1 :]

    # -- sweep batch 16 -----------------------------------------------------

    _UNNEST_FROM_RE = re.compile(r"(?i)\b(from|join)\s+unnest\s*\(")
    _UNNEST_RE = re.compile(r"(?i)\bunnest\s*\(")
    _COLLATE_RE = re.compile(r"(?i)\bcollate\s+(\w+)")

    def _rewrite_unnest(self, sql: str) -> str:
        """Batch-16 sweep: ``unnest(arr)`` in SELECT position is DuckDB's
        one-row-per-element generator → Spark explode (a bare rename —
        Spark then enforces its own generator placement rules, so
        expression-wrapped forms like ``unnest(a) + 1`` fail LOUDLY
        rather than mistranslate). ``FROM unnest(arr)`` (table-function
        position) → an exploded subquery with column ``unnest``
        (DuckDB auto-names the column after the expression text — not
        portable either way; alias it). ``recursive := true`` raises."""
        while True:
            m = self._search_code(self._UNNEST_FROM_RE, sql)
            if not m:
                break
            close = self._find_close(sql, m.end() - 1)
            if close == -1:
                break
            inner = sql[m.end() : close]
            if ":=" in inner:
                raise UQueryError.sql_error(
                    "unnest: the recursive := form is not supported"
                )
            sql = (
                sql[: m.start()]
                + f"{m.group(1)} (SELECT explode({inner}) AS unnest)"
                + sql[close + 1 :]
            )
        if self._search_code(self._UNNEST_RE, sql):
            out, pos = [], 0
            while True:
                m = self._search_code(self._UNNEST_RE, sql, pos)
                if not m:
                    break
                close = self._find_close(sql, m.end() - 1)
                if close != -1 and ":=" in sql[m.end() : close]:
                    raise UQueryError.sql_error(
                        "unnest: the recursive := form is not supported"
                    )
                out.append(sql[pos : m.start()])
                out.append("explode(")
                pos = m.end()
            out.append(sql[pos:])
            sql = "".join(out)
        return sql

    def _rewrite_collate(self, sql: str) -> str:
        """Batch-16 sweep: ``COLLATE NOCASE`` → Spark's UTF8_LCASE
        collation (spot-verified identical: 'A' < 'b', 'É' = 'é',
        'ß' <> 'SS' — both engines use simple case folding, not full
        folding). Other DuckDB collations (NOACCENT, NFC, ICU locales)
        have no Spark equivalent and raise."""
        pos = 0
        while True:
            m = self._search_code(self._COLLATE_RE, sql, pos)
            if not m:
                return sql
            name = m.group(1).lower()
            if name == "nocase":
                sql = sql[: m.start()] + "COLLATE UTF8_LCASE" + sql[m.end() :]
                pos = m.start() + len("COLLATE UTF8_LCASE")
            elif name in ("utf8_binary", "utf8_lcase", "unicode", "unicode_ci"):
                pos = m.end()  # already a Spark collation name
            else:
                raise UQueryError.sql_error(
                    f"COLLATE {m.group(1)} is not supported (only NOCASE)"
                )

    _ARRAY_AGG_RE = re.compile(r"(?i)\barray_agg\s*\(")

    def _rewrite_array_agg_order(self, sql: str) -> str:
        """Batch-16 sweep: ``array_agg(x ORDER BY k …)`` — DuckDB's
        ordered aggregate; Spark's array_agg has no ORDER BY → collect
        (key…, value) structs and sort with an explicit comparator
        lambda (array_sort's 2-arg form), then project the value back
        out. Honors multiple keys, ASC/DESC and NULLS FIRST/LAST per
        key (DuckDB defaults NULLS LAST for BOTH directions — the
        batch-7 finding). Ties are engine-unspecified on both sides.
        Window usage and DISTINCT+ORDER BY raise. Structs are never
        NULL, so NULL values are kept exactly like DuckDB; round 8
        added the trailing-FILTER fold and the empty→NULL guard, and
        `_rewrite_array_agg_nulls` gives the remaining UNORDERED forms
        the same NULL-keeping treatment (deviation fully closed)."""
        pos = 0
        while True:
            hit = self._call_args(self._ARRAY_AGG_RE, sql, pos)
            if not hit:
                return sql
            m, close, args = hit
            inner = sql[m.end() : close]
            ob = next(
                (s for s, _e, _w in self._scan_top_level(inner, {"order"})),
                None,
            )
            if ob is None or not re.match(r"(?i)order\s+by\b", inner[ob:]):
                pos = m.end()
                continue
            expr = inner[:ob].strip()
            distinct = False
            if re.match(r"(?i)^distinct\b", expr):
                distinct = True
                expr = re.sub(r"(?i)^distinct\s*", "", expr)
            # optional trailing FILTER — folded into the struct (NULL
            # structs don't collect, exactly FILTER semantics; runs
            # before the batch-9 WHERE-keyword insertion, so accept
            # both FILTER (WHERE c) and DuckDB's bare FILTER (c))
            suffix_end = close + 1
            filt = None
            fm = re.match(r"(?i)\s*filter\s*\(", sql[suffix_end:])
            if fm:
                fclose = self._find_close(sql, suffix_end + fm.end() - 1)
                if fclose == -1:
                    raise UQueryError.sql_error("FILTER: unbalanced parentheses")
                filt = re.sub(
                    r"(?i)^\s*where\b", "", sql[suffix_end + fm.end() : fclose]
                ).strip()
                suffix_end = fclose + 1
            if re.match(r"(?i)\s*over\b", sql[suffix_end:]):
                raise UQueryError.sql_error(
                    "array_agg ORDER BY over a window is not supported"
                )
            keys = []
            for k in self._split_top(
                re.sub(r"(?i)^order\s+by\s*", "", inner[ob:]).strip(), ","
            ):
                k = k.strip()
                nm = re.search(r"(?i)\s+nulls\s+(first|last)\s*$", k)
                nulls_first = bool(nm and nm.group(1).lower() == "first")
                k = k[: nm.start()] if nm else k
                dm = re.search(r"(?i)\s+(asc|desc)\s*$", k)
                desc = bool(dm and dm.group(1).lower() == "desc")
                k = (k[: dm.start()] if dm else k).strip()
                keys.append((k, desc, nulls_first))
            fields = ", ".join(
                [f"({k}) AS uq_k{n}" for n, (k, _d, _nf) in enumerate(keys)]
                + [f"({expr}) AS uq_av"]
            )
            cmp_body = "0"
            for n in range(len(keys) - 1, -1, -1):
                _k, desc, nulls_first = keys[n]
                lt, gt = ("1", "-1") if desc else ("-1", "1")
                n_l, n_r = ("-1", "1") if nulls_first else ("1", "-1")
                f = f"uq_k{n}"
                cmp_body = (
                    f"CASE WHEN uq_l.{f} IS NULL AND uq_r.{f} IS NULL THEN {cmp_body} "
                    f"WHEN uq_l.{f} IS NULL THEN {n_l} "
                    f"WHEN uq_r.{f} IS NULL THEN {n_r} "
                    f"WHEN uq_l.{f} < uq_r.{f} THEN {lt} "
                    f"WHEN uq_l.{f} > uq_r.{f} THEN {gt} "
                    f"ELSE {cmp_body} END"
                )
            if distinct:
                # DuckDB admits DISTINCT + ORDER BY only when the sort
                # key IS the aggregated expression (Postgres rule);
                # dedupe the values then sort them directly (round 8).
                norm = lambda t: re.sub(r"\s+", "", t).lower()  # noqa: E731
                if len(keys) != 1 or norm(keys[0][0]) != norm(expr):
                    raise UQueryError.sql_error(
                        "array_agg DISTINCT with ORDER BY requires "
                        "ordering by the aggregated expression"
                    )
                _k, desc, nulls_first = keys[0]
                lt, gt = ("1", "-1") if desc else ("-1", "1")
                n_l, n_r = ("-1", "1") if nulls_first else ("1", "-1")
                # sort STRUCTS, not bare values: Spark's comparator
                # array_sort silently drops NULL elements, structs are
                # never NULL (same trick as the multi-key path)
                vcmp = (
                    f"CASE WHEN uq_l.uq_av IS NULL AND uq_r.uq_av IS NULL "
                    f"THEN 0 "
                    f"WHEN uq_l.uq_av IS NULL THEN {n_l} "
                    f"WHEN uq_r.uq_av IS NULL THEN {n_r} "
                    f"WHEN uq_l.uq_av < uq_r.uq_av THEN {lt} "
                    f"WHEN uq_l.uq_av > uq_r.uq_av THEN {gt} ELSE 0 END"
                )
                elem = f"struct(({expr}) AS uq_av)"
                if filt is not None:
                    elem = f"CASE WHEN {filt} THEN {elem} END"
                arr = (
                    f"transform(array_sort(array_distinct("
                    f"collect_list({elem})), "
                    f"(uq_l, uq_r) -> {vcmp}), uq_s -> uq_s.uq_av)"
                )
                repl = f"(CASE WHEN size({arr}) = 0 THEN NULL ELSE {arr} END)"
                sql = sql[: m.start()] + repl + sql[suffix_end:]
                pos = m.start() + len(repl)
                continue
            elem = f"struct({fields})"
            if filt is not None:
                elem = f"CASE WHEN {filt} THEN {elem} END"
            arr = (
                f"transform(array_sort(collect_list({elem}), "
                f"(uq_l, uq_r) -> {cmp_body}), uq_s -> uq_s.uq_av)"
            )
            # DuckDB returns NULL (not []) when no rows aggregate —
            # the duplicated aggregate dedupes in Catalyst
            repl = f"(CASE WHEN size({arr}) = 0 THEN NULL ELSE {arr} END)"
            sql = sql[: m.start()] + repl + sql[suffix_end:]
            pos = m.start() + len(repl)

    def _rewrite_array_agg_nulls(self, sql: str) -> str:
        """Unordered ``list()``/``array_agg`` NULL parity (closes NOTES
        item 11, the last known silent wrong-value deviation): DuckDB's
        list()/array_agg KEEP NULL elements and return NULL (not [])
        when no rows aggregate; Spark's collect_list/array_agg drop
        NULLs and return []. Every remaining array_agg call (the
        ordered forms were consumed by _rewrite_array_agg_order) is
        rewritten element-in-struct — structs are never NULL, so
        nothing is dropped — then size-guarded back to NULL on empty:

        - ``array_agg(x)`` → transform(collect_list(struct(x)), unwrap)
        - ``DISTINCT`` → array_distinct(…) outside the unwrap (DuckDB
          keeps exactly one NULL — probed)
        - ``FILTER`` → folded into the struct via CASE (a NULL struct
          doesn't collect — exactly FILTER semantics; works identically
          under OVER, where Spark rejects native FILTER)
        - ``OVER (spec)`` / ``OVER name`` rides on the inner
          collect_list; named specs are inlined by the later window
          passes as usual

        Runs after _rewrite_agg_semantics (WHERE-keyword insertion) and
        before the window passes. Reference semantics via the DuckDB
        delegation pass-through (src/core/duckdb.rs:87-88); behavior
        DuckDB-1.x-probed: NULL-keep, single-NULL DISTINCT, empty→NULL,
        FILTER exclusion, windowed running frames.
        """
        pos = 0
        while True:
            hit = self._call_args(self._ARRAY_AGG_RE, sql, pos)
            if not hit:
                return sql
            m, close, args = hit
            inner = sql[m.end() : close].strip()
            distinct = False
            if re.match(r"(?i)^distinct\b", inner):
                distinct = True
                inner = re.sub(r"(?i)^distinct\s*", "", inner)
            if len(self._split_top(inner, ",")) != 1 or not inner:
                raise UQueryError.sql_error("array_agg expects exactly 1 argument")
            # optional FILTER (WHERE c) and OVER (spec)|OVER name suffixes
            suffix_end = close + 1
            filt = None
            fm = re.match(r"(?i)\s*filter\s*\(", sql[suffix_end:])
            if fm:
                fclose = self._find_close(sql, suffix_end + fm.end() - 1)
                if fclose == -1:
                    raise UQueryError.sql_error("FILTER: unbalanced parentheses")
                filt = re.sub(
                    r"(?i)^\s*where\b", "", sql[suffix_end + fm.end() : fclose]
                ).strip()
                suffix_end = fclose + 1
            over_txt = None
            om = re.match(r"(?i)\s*over\s*", sql[suffix_end:])
            if om:
                rest = sql[suffix_end + om.end() :]
                if rest.startswith("("):
                    oclose = self._find_close(sql, suffix_end + om.end())
                    if oclose == -1:
                        raise UQueryError.sql_error("OVER: unbalanced parentheses")
                    over_txt = sql[suffix_end + om.end() : oclose + 1]
                    suffix_end = oclose + 1
                else:
                    wm = re.match(r"\w+", rest)
                    if not wm:
                        raise UQueryError.sql_error("OVER: expected window")
                    over_txt = wm.group(0)
                    suffix_end = suffix_end + om.end() + wm.end()
            elem = f"struct(({inner}) AS uq_av)"
            if filt is not None:
                elem = f"CASE WHEN {filt} THEN {elem} END"
            core = f"collect_list({elem})"
            if over_txt is not None:
                core = f"{core} OVER {over_txt}"
            arr = f"transform({core}, uq_s -> uq_s.uq_av)"
            if distinct:
                arr = f"array_distinct({arr})"
            # DuckDB: zero rows aggregated → NULL, never [] (probed);
            # the duplicated aggregate dedupes in Catalyst
            repl = f"(CASE WHEN size({arr}) = 0 THEN NULL ELSE {arr} END)"
            sql = sql[: m.start()] + repl + sql[suffix_end:]
            pos = m.start() + len(repl)

    _SIGNBIT_RE = re.compile(r"(?i)\bsignbit\s*\(")
    _ENCODE_RE = re.compile(r"(?i)\bencode\s*\(")
    _MAKE_TS_RE = re.compile(r"(?i)\bmake_timestamp\s*\(")

    _ARRAY_LENGTH2_RE = re.compile(r"(?i)\barray_length\s*\(")

    def _rewrite_b29_fns(self, sql: str) -> str:
        """Round-8 gap-probe scalars: 2-arg ``array_length(x, 1)`` →
        the 1-arg form (dimension 1 is the only one Spark's size() can
        answer; deeper dims raise). (The [not_][i]like_escape family
        lives in the batch-7 pass — round 8 extended it with the not_
        variants.)"""
        # regr_avgx/avgy: DuckDB returns DOUBLE; Spark's avg-of-DECIMAL
        # typing leaks a DECIMAL schema (value-same — wave-3 probe).
        # r9 ADVICE fix: any trailing FILTER (...) / OVER (...) suffix
        # must ride INSIDE the CAST — wrapping the bare call produced
        # `CAST(f(x) AS DOUBLE) OVER (...)`, a ParseException for
        # previously-working windowed/filtered forms.
        pos = 0
        ravg_re = re.compile(r"(?i)\bregr_avg[xy]\s*\(")
        while True:
            hit = self._call_args(ravg_re, sql, pos)
            if not hit:
                break
            m, close, args = hit
            _f, _o, endpos = self._nested_agg_over(sql, close, "regr_avg")
            repl = f"CAST({sql[m.start() : endpos + 1]} AS DOUBLE)"
            sql = sql[: m.start()] + repl + sql[endpos + 1 :]
            pos = m.start() + len(repl)
        pos = 0
        while True:
            hit = self._call_args(self._ARRAY_LENGTH2_RE, sql, pos)
            if not hit:
                return sql
            m, close, args = hit
            if len(args) != 2:
                pos = m.end()
                continue
            if args[1].strip() != "1":
                raise UQueryError.sql_error(
                    "array_length: only dimension 1 is supported"
                )
            repl = f"array_length({args[0]})"
            sql = sql[: m.start()] + repl + sql[close + 1 :]
            pos = m.start() + len(repl)

    def _rewrite_b17_scalars(self, sql: str) -> str:
        """Batch-17 scalar corners: ``signbit(x)`` → (x < 0) —
        DuckDB's own signbit(-0.0) is false, so the sign test is exact;
        1-arg ``encode(s)`` (UTF-8 BLOB) → Spark's 2-arg
        encode(s, 'UTF-8'); 1-arg ``make_timestamp(µs)`` →
        timestamp_micros (the 6-arg form is natively identical and
        stays untouched)."""
        while True:
            hit = self._call_args(self._SIGNBIT_RE, sql)
            if not hit:
                break
            m, close, args = hit
            if len(args) != 1:
                raise UQueryError.sql_error("signbit expects 1 arg")
            sql = sql[: m.start()] + f"(({args[0]}) < 0)" + sql[close + 1 :]
        pos = 0
        while True:
            hit = self._call_args(self._ENCODE_RE, sql, pos)
            if not hit:
                break
            m, close, args = hit
            if len(args) != 1:
                pos = m.end()  # Spark's own 2-arg encode — leave native
                continue
            repl = f"encode(({args[0]}), 'UTF-8')"
            sql = sql[: m.start()] + repl + sql[close + 1 :]
            pos = m.start() + len(repl)
        pos = 0
        while True:
            hit = self._call_args(self._MAKE_TS_RE, sql, pos)
            if not hit:
                break
            m, close, args = hit
            if len(args) != 1:
                pos = m.end()  # 6-arg civil form — natively identical
                continue
            repl = f"timestamp_micros(({args[0]}))"
            sql = sql[: m.start()] + repl + sql[close + 1 :]
            pos = m.start() + len(repl)
        return sql

    _MAD_RE = re.compile(r"(?i)\bmad\s*\(")
    _ENTROPY_RE = re.compile(r"(?i)\bentropy\s*\(")
    _HISTOGRAM_RE = re.compile(r"(?i)\bhistogram\s*\(")

    def _nested_agg_over(self, sql: str, close: int, fn: str):
        """Round 7: the nested-agg translations support OVER by
        suffixing EVERY internal aggregate (collect_list / percentile)
        with the window clause — Catalyst computes each distinct
        window expression once per spec, so the repeated text costs
        one collect per row like the grouped form costs one per group.
        Default-frame semantics (whole partition without ORDER BY,
        RANGE UNBOUNDED..CURRENT ROW with) are the same rule in both
        engines — differential-tested. Round 8: FILTER no longer
        raises — all three aggregates SKIP NULLs, so the filter
        CASE-folds into the argument exactly (excluded rows become
        NULLs that never collect); works identically under OVER.
        Returns (filter_cond | None, over_text | None, end_index)."""
        i, n = close + 1, len(sql)
        while i < n and sql[i].isspace():
            i += 1
        filt, fend = None, close
        fm = re.match(r"(?i)filter\s*\(", sql[i:])
        if fm:
            fend = self._find_close(sql, i + fm.end() - 1)
            if fend == -1:
                raise UQueryError.sql_error(f"{fn}: unbalanced FILTER (")
            filt = re.sub(
                r"(?i)^\s*where\b", "", sql[i + fm.end() : fend]
            ).strip()
            i = fend + 1
            while i < n and sql[i].isspace():
                i += 1
        m = re.match(r"(?i)over\b", sql[i:])
        if not m:
            return filt, None, fend
        j = i + m.end()
        while j < n and sql[j].isspace():
            j += 1
        if j < n and sql[j] == "(":
            e = self._find_close(sql, j)
            if e == -1:
                raise UQueryError.sql_error(f"{fn}: unbalanced OVER (")
            return filt, sql[j : e + 1], e
        k = j
        while k < n and (sql[k].isalnum() or sql[k] == "_"):
            k += 1
        if k == j:
            raise UQueryError.sql_error(f"{fn}: malformed OVER clause")
        return filt, sql[j:k], k - 1

    @staticmethod
    def _median_of(arr: str) -> str:
        """Interpolated median of a sorted DOUBLE array (DuckDB's rule
        for non-decimal inputs; try_element_at keeps ANSI quiet)."""
        # element_at wants INT: shiftright keeps size()'s INT type
        # (div widens to BIGINT, and an emitted CAST would cost two
        # failed _rewrite_cast probe round-trips per occurrence)
        mid = f"shiftright(size({arr}) + 1, 1)"
        lo = f"shiftright(size({arr}), 1)"
        return (
            f"CASE WHEN size({arr}) % 2 = 1 "
            f"THEN try_element_at({arr}, {mid}) "
            f"ELSE (try_element_at({arr}, {lo}) + "
            f"try_element_at({arr}, {lo} + 1)) / 2 END"
        )

    def _rewrite_nested_aggs(self, sql: str) -> str:
        """Batch-15 sweep: aggregates whose DuckDB semantics nest a
        second aggregation — expressed as expression trees over ONE
        collect_list (Catalyst dedupes the repeated aggregate, so each
        group materializes its list once; memory is O(group), the
        standard exact-median footprint, documented):

        - ``mad(x)``: median(abs(x - median(x))), interpolated like
          DuckDB's double median; all-NULL/empty group → NULL.
        - ``entropy(x)``: -Σ (c/n)·log2(c/n) over value frequencies;
          NULLs skipped; empty group → 0.0 (DuckDB-verified, not NULL);
          ``+ 0`` normalizes IEEE -0.0 (the sf0.1-gate signed-zero rule).
        - ``histogram(x)``: MAP of value → BIGINT count, keys ascending;
          empty → NULL (verified).

        Round 8: FILTER CASE-folds into the argument (all three skip
        NULLs — excluded rows vanish exactly), and DISTINCT forms
        translate: entropy(DISTINCT) = log2(n_distinct) and
        histogram(DISTINCT) maps every key to 1 (closed forms — each
        distinct value has frequency 1), mad(DISTINCT) dedupes via
        collect_set with a percentile(DISTINCT) median (grouped only;
        its OVER form still raises).
        """
        for regex, kind in (
            (self._MAD_RE, "mad"),
            (self._ENTROPY_RE, "entropy"),
            (self._HISTOGRAM_RE, "histogram"),
        ):
            while True:
                hit = self._call_args(regex, sql)
                if not hit:
                    break
                m, close, args = hit
                filt, over, endpos = self._nested_agg_over(sql, close, kind)
                osuf = f" OVER {over}" if over else ""
                if len(args) != 1:
                    raise UQueryError.sql_error(f"{kind} expects 1 argument")
                x = args[0]
                distinct = False
                if re.match(r"(?i)^distinct\b", x):
                    # round 8: DISTINCT forms — entropy/histogram have
                    # closed forms over the distinct set (every
                    # frequency is 1); mad dedupes via collect_set and
                    # takes the median of the distinct values
                    distinct = True
                    x = re.sub(r"(?i)^distinct\s*", "", x)
                if filt is not None:
                    # FILTER folds into the argument: all three
                    # aggregates skip NULLs, so excluded rows vanish
                    # (applied BEFORE the DISTINCT dedup, like SQL)
                    x = f"CASE WHEN {filt} THEN ({x}) END"
                if distinct and kind == "mad" and over:
                    # round 9 (last raise-tail member of this family):
                    # no percentile(DISTINCT) exists over a window, and
                    # inlining the median into the transform lambda is
                    # the r7 O(n² log n) trap (lambda-invariant
                    # subexpressions re-evaluate per element). LET-bind
                    # instead: aggregate(array(0), v, (a,i)->a, body)
                    # evaluates v ONCE (zero) and body ONCE (finish), so
                    # sorted set, median, and deviations are each
                    # computed once and referenced as bound lambda vars.
                    cs = f"collect_set(CAST(({x}) AS DOUBLE)){osuf}"
                    med_s = self._median_of("uq_ls")
                    devs = (
                        "array_sort(transform(uq_ls, "
                        "uq_mv -> abs(uq_mv - uq_lm)))"
                    )
                    fin = self._median_of("uq_ld")
                    repl = (
                        f"(aggregate(array(0), array_sort({cs}), "
                        f"(uq_a1, uq_i1) -> uq_a1, "
                        f"uq_ls -> aggregate(array(0), ({med_s}), "
                        f"(uq_a2, uq_i2) -> uq_a2, "
                        f"uq_lm -> aggregate(array(0), {devs}, "
                        f"(uq_a3, uq_i3) -> uq_a3, "
                        f"uq_ld -> ({fin})))))"
                    )
                elif distinct and kind == "mad":
                    # collect_set = the distinct multiset; the median of
                    # distinct values comes from percentile(DISTINCT) —
                    # a plain aggregate attribute, loop-invariant in the
                    # lambda (the r7 O(n^2 log n) lesson)
                    cs = f"collect_set(CAST(({x}) AS DOUBLE))"
                    med = f"percentile(DISTINCT CAST(({x}) AS DOUBLE), 0.5)"
                    devs = (
                        f"array_sort(transform({cs}, "
                        f"uq_mv -> abs(uq_mv - {med})))"
                    )
                    repl = (
                        f"(CASE WHEN size({cs}) = 0 THEN NULL "
                        f"ELSE ({self._median_of(devs)}) END)"
                    )
                elif distinct and kind == "entropy":
                    cl = f"collect_list({x}){osuf}"
                    nd = f"CAST(size(array_distinct({cl})) AS DOUBLE)"
                    # every distinct value has frequency 1 -> log2(n)
                    repl = (
                        f"(CASE WHEN size({cl}) = 0 THEN CAST(0 AS DOUBLE) "
                        f"ELSE log2({nd}) END + 0)"
                    )
                elif distinct and kind == "histogram":
                    cl = f"collect_list({x}){osuf}"
                    entries = (
                        f"transform(array_sort(array_distinct({cl})), uq_hv -> "
                        f"struct(uq_hv AS key, CAST(1 AS BIGINT) AS value))"
                    )
                    repl = (
                        f"(CASE WHEN size({cl}) = 0 THEN NULL "
                        f"ELSE map_from_entries({entries}) END)"
                    )
                elif kind == "mad" and self._ordered_spec(over):
                    # round 11 (wave-7): an ORDER BY / framed window —
                    # Spark's percentile window rejects the spec, so
                    # the running median comes from the collected list
                    # itself, LET-bound once like the DISTINCT-over
                    # branch (running mads DuckDB-probed: [0.0, 5.5,
                    # 4.5] over ROWS BETWEEN 1 PRECEDING AND CURRENT
                    # ROW on (10, 21, 30)).
                    cs = f"collect_list(CAST(({x}) AS DOUBLE)){osuf}"
                    med_s = self._median_of("uq_ls")
                    devs = (
                        "array_sort(transform(uq_ls, "
                        "uq_mv -> abs(uq_mv - uq_lm)))"
                    )
                    fin = self._median_of("uq_ld")
                    repl = (
                        f"(aggregate(array(0), array_sort({cs}), "
                        f"(uq_a1, uq_i1) -> uq_a1, "
                        f"uq_ls -> CASE WHEN size(uq_ls) = 0 THEN NULL "
                        f"ELSE aggregate(array(0), ({med_s}), "
                        f"(uq_a2, uq_i2) -> uq_a2, "
                        f"uq_lm -> aggregate(array(0), {devs}, "
                        f"(uq_a3, uq_i3) -> uq_a3, "
                        f"uq_ld -> ({fin}))) END))"
                    )
                elif kind == "mad":
                    # the group median comes from Spark's native exact
                    # interpolated percentile AGGREGATE — as a plain
                    # post-aggregation attribute it is loop-invariant in
                    # the lambda below. (The first draft inlined the
                    # median as an element_at-over-array_sort expression
                    # INSIDE the transform lambda; Spark re-evaluates the
                    # sort per element — O(n² log n) per group, measured
                    # hanging the sf0.01 gate on a 3000-row group.)
                    cl = f"collect_list(CAST(({x}) AS DOUBLE)){osuf}"
                    med = f"percentile(CAST(({x}) AS DOUBLE), 0.5){osuf}"
                    devs = (
                        f"array_sort(transform({cl}, "
                        f"uq_mv -> abs(uq_mv - {med})))"
                    )
                    repl = (
                        f"(CASE WHEN size({cl}) = 0 THEN NULL "
                        f"ELSE ({self._median_of(devs)}) END)"
                    )
                elif kind == "entropy":
                    cl = f"collect_list({x}){osuf}"
                    n = f"CAST(size({cl}) AS DOUBLE)"
                    freqs = (
                        f"transform(array_distinct({cl}), uq_ev -> "
                        f"CAST(size(filter({cl}, uq_e -> uq_e = uq_ev)) AS DOUBLE))"
                    )
                    repl = (
                        f"((0 - aggregate({freqs}, CAST(0 AS DOUBLE), "
                        f"(uq_a, uq_c) -> uq_a + (uq_c / {n}) * log2(uq_c / {n}))) + 0)"
                    )
                else:
                    cl = f"collect_list({x}){osuf}"
                    entries = (
                        f"transform(array_sort(array_distinct({cl})), uq_hv -> "
                        f"struct(uq_hv AS key, "
                        f"CAST(size(filter({cl}, uq_e -> uq_e = uq_hv)) AS BIGINT) AS value))"
                    )
                    repl = (
                        f"(CASE WHEN size({cl}) = 0 THEN NULL "
                        f"ELSE map_from_entries({entries}) END)"
                    )
                sql = sql[: m.start()] + repl + sql[endpos + 1 :]
        return sql

    _STRUCT_INSERT_RE = re.compile(r"(?i)\bstruct_insert\s*\(")
    _SI_FIELDS_RE = re.compile(r"No such struct field `[^`]*` in (.+)")

    def _rewrite_struct_insert(self, sql: str) -> str:
        """Batch-15: ``struct_insert(s, k := v, …)`` appends fields to a
        struct. The existing field names are unknowable from text — a
        LIMIT-0 analysis probe replaces the call with a field access
        that cannot resolve, and Spark's FIELD_NOT_FOUND error text
        enumerates the struct's actual fields (backticked). DuckDB
        errors on duplicate entry names — reproduced. Runs late (after
        the expression passes) so the probe text is Spark-valid modulo
        the cast/len passes it composes, same contract as the
        polymorphic-subscript probe."""
        while True:
            # innermost-first: a nested struct_insert inside the probe
            # text would fail analysis with the wrong error
            hit, pos = None, 0
            while True:
                nxt = self._call_args(self._STRUCT_INSERT_RE, sql, pos)
                if not nxt:
                    break
                hit = nxt
                if not any("struct_insert" in a.lower() for a in nxt[2]):
                    break
                pos = nxt[0].end()
            if not hit:
                return sql
            m, close, args = hit
            if len(args) < 2:
                raise UQueryError.sql_error(
                    "struct_insert expects (struct, name := value, …)"
                )
            base = args[0]
            inserts = []
            for a in args[1:]:
                k, sep, v = a.partition(":=")
                if not sep:
                    raise UQueryError.sql_error(
                        "struct_insert: entries must use name := value"
                    )
                inserts.append((k.strip(), v.strip()))
            probe = (
                sql[: m.start()]
                + f"(({base}).uq_si_missing_field)"
                + sql[close + 1 :]
            )
            fields: list[str] = []
            try:
                with _probe_quiet():
                    self.spark.sql(
                        f"SELECT * FROM ({self._rewrite_len(self._rewrite_cast(probe))}) uq_si LIMIT 0"
                    )
            except Exception as exc:
                fm = self._SI_FIELDS_RE.search(str(exc))
                if fm:
                    fields = re.findall(r"`([^`]+)`", fm.group(1))
            if not fields:
                raise UQueryError.sql_error(
                    "struct_insert: first argument is not a struct "
                    "(or its fields could not be probed)"
                )
            existing = {f.lower() for f in fields}
            for k, _v in inserts:
                if k.lower() in existing:
                    raise UQueryError.sql_error(
                        f'struct_insert: duplicate struct entry name "{k}"'
                    )
                existing.add(k.lower())
            parts = [f"'{f}', ({base}).`{f}`" for f in fields]
            parts += [f"'{k}', ({v})" for k, v in inserts]
            repl = f"named_struct({', '.join(parts)})"
            sql = sql[: m.start()] + repl + sql[close + 1 :]

    _STRUCT_EXTRACT_AT_RE = re.compile(r"(?i)\bstruct_extract_at\s*\(")

    def _rewrite_struct_extract_at(self, sql: str) -> str:
        """DuckDB ≥1.1 ``struct_extract_at(s, n)`` — 1-based POSITIONAL
        field access (the reference pins 1.5.2; r13 probe batch A).
        Field names are unknowable from text, so the struct's fields
        are enumerated with the same FIELD_NOT_FOUND LIMIT-0 probe as
        struct_insert, and the n-th name is emitted as a plain field
        access. n must be a positive integer literal (DuckDB's own
        constant requirement); out-of-range raises like DuckDB's
        binder."""
        while True:
            hit = self._call_args(self._STRUCT_EXTRACT_AT_RE, sql)
            if not hit:
                return sql
            m, close, args = hit
            if len(args) != 2:
                raise UQueryError.sql_error(
                    "struct_extract_at expects (struct, index)"
                )
            base, idx = args[0], args[1].strip()
            if not re.fullmatch(r"\+?\d+", idx) or int(idx) < 1:
                raise UQueryError.sql_error(
                    "struct_extract_at: index must be a positive "
                    "integer constant"
                )
            probe = (
                sql[: m.start()]
                + f"(({base}).uq_si_missing_field)"
                + sql[close + 1 :]
            )
            fields: list[str] = []
            try:
                with _probe_quiet():
                    self.spark.sql(
                        f"SELECT * FROM ({self._rewrite_len(self._rewrite_cast(probe))}) uq_sx LIMIT 0"
                    )
            except Exception as exc:
                fm = self._SI_FIELDS_RE.search(str(exc))
                if fm:
                    fields = re.findall(r"`([^`]+)`", fm.group(1))
            if not fields:
                raise UQueryError.sql_error(
                    "struct_extract_at: first argument is not a struct "
                    "(or its fields could not be probed)"
                )
            if int(idx) > len(fields):
                raise UQueryError.sql_error(
                    f"struct_extract_at: index {idx} out of range for "
                    f"a struct with {len(fields)} fields"
                )
            repl = f"(({base}).`{fields[int(idx) - 1]}`)"
            sql = sql[: m.start()] + repl + sql[close + 1 :]

    def _rewrite_limit_pct(self, sql: str) -> str:
        """Batch-15: top-level ``ORDER BY … LIMIT p%`` (DuckDB keeps
        floor(p·count/100) rows — verified: 15% of 10 → 1, 26% → 2) →
        row_number + count window over the ordered body, filtered and
        re-ordered, helper columns dropped via ``* EXCEPT``. The
        pre-count this needs is exactly one extra exchange-free window
        over the already-global sort DuckDB's own LIMIT % pays too.
        Orderless or subquery LIMIT % raises (DuckDB's orderless form
        returns an arbitrary subset — untranslatable deterministically);
        ordinal ORDER BY keys raise (inside OVER they'd silently become
        constants)."""
        if not self._search_code(self._LIMIT_PCT_RE, sql):
            return sql
        hits = [
            (s, e, w)
            for s, e, w in self._scan_top_level(sql, {"order", "limit"})
        ]
        lim = next(
            (
                (s, e)
                for s, e, w in hits
                if w == "limit"
                and re.match(r"\s*\d+(?:\.\d+)?\s*%\s*$", sql[e:])
            ),
            None,
        )
        order = next(
            ((s, e) for s, e, w in reversed(hits) if w == "order" and (not lim or s < lim[0])),
            None,
        )
        if not lim or not order or not re.match(
            r"(?i)\s*by\b", sql[order[1] :]
        ):
            raise UQueryError.sql_error(
                "LIMIT n% requires a top-level ORDER BY (DuckDB's "
                "orderless form returns an arbitrary subset)"
            )
        pct = sql[lim[1] :].strip().rstrip("%").strip()
        keys_text = sql[order[1] : lim[0]]
        keys_text = re.sub(r"(?i)^\s*by\b", "", keys_text).strip()
        if any(
            re.fullmatch(r"\d+", k.strip().split()[0])
            for k in self._split_top(keys_text, ",")
            if k.strip()
        ):
            raise UQueryError.sql_error(
                "LIMIT n% with ordinal ORDER BY keys is not supported"
            )
        body = sql[: order[0]].strip()
        return (
            f"SELECT * EXCEPT (uq_rn, uq_cnt) FROM ("
            f"SELECT uq_lp.*, row_number() OVER (ORDER BY {keys_text}) AS uq_rn, "
            f"count(*) OVER () AS uq_cnt FROM ({body}) uq_lp"
            f") uq_lpq WHERE uq_rn <= floor(uq_cnt * {pct} / 100.0) "
            f"ORDER BY uq_rn"
        )

    # -- sweep batch 12: operator symbols -----------------------------------

    def _atom_left(self, sql: str, i: int):
        """Start index of the expression atom ending just before ``i``
        (identifier/dotted name, literal, or a balanced ()/[]-group with
        an optional call name) — None if the context is not atomic."""
        j = i
        while j > 0 and sql[j - 1].isspace():
            j -= 1
        if j == 0:
            return None
        c = sql[j - 1]
        if c in ")]":
            depth, k, in_lit = 0, j - 1, False
            opener = {"]": "[", ")": "("}[c]
            closer = c
            while k >= 0:
                ch = sql[k]
                if ch == "'":
                    in_lit = not in_lit
                elif not in_lit:
                    if ch == closer:
                        depth += 1
                    elif ch == opener:
                        depth -= 1
                        if depth == 0:
                            break
                k -= 1
            if k < 0:
                return None
            while k > 0 and (sql[k - 1].isalnum() or sql[k - 1] in "_."):
                k -= 1
            return k
        if c == "'":
            k = sql.rfind("'", 0, j - 1)
            return k if k >= 0 else None
        if c.isalnum() or c in "_.":
            k = j
            while k > 0 and (sql[k - 1].isalnum() or sql[k - 1] in "_."):
                k -= 1
            return k
        return None

    def _atom_right(self, sql: str, i: int):
        """End index (exclusive) of the atom starting at/after ``i`` —
        optional sign, then literal / identifier / balanced group, plus
        postfix call/subscript chains."""
        n = len(sql)
        j = i
        while j < n and sql[j].isspace():
            j += 1
        if j < n and sql[j] in "+-":
            j += 1
        if j >= n:
            return None
        c = sql[j]
        if c == "'":
            k = sql.find("'", j + 1)
            return None if k == -1 else k + 1
        if c in "([":
            close = self._find_close(sql, j) if c == "(" else None
            if c == "[":
                depth, k, in_lit = 0, j, False
                while k < n:
                    ch = sql[k]
                    if ch == "'":
                        in_lit = not in_lit
                    elif not in_lit:
                        if ch == "[":
                            depth += 1
                        elif ch == "]":
                            depth -= 1
                            if depth == 0:
                                break
                    k += 1
                close = k if k < n else -1
            if close in (None, -1):
                return None
            j = close + 1
        elif c.isalnum() or c == "_":
            while j < n and (sql[j].isalnum() or sql[j] in "_."):
                j += 1
        else:
            return None
        # postfix chains: calls and subscripts
        while j < n:
            k = j
            while k < n and sql[k].isspace():
                k += 1
            if k < n and sql[k] == "(":
                close = self._find_close(sql, k)
                if close == -1:
                    return j
                j = close + 1
            elif k < n and sql[k] == "[" and k == j:  # no space before subscript
                depth, p, in_lit = 0, k, False
                while p < n:
                    ch = sql[p]
                    if ch == "'":
                        in_lit = not in_lit
                    elif not in_lit:
                        if ch == "[":
                            depth += 1
                        elif ch == "]":
                            depth -= 1
                            if depth == 0:
                                break
                    p += 1
                if p >= n:
                    return j
                j = p + 1
            else:
                break
        return j

    _LIKE_OPS = [  # longest first
        ("!~~*", " NOT ILIKE "), ("~~*", " ILIKE "),
        ("!~~", " NOT LIKE "), ("~~", " LIKE "),
        ("!~", " NOT RLIKE "),
    ]
    _FN_OPS = [("**", "power"), ("<->", "list_distance"), ("<=>", "list_cosine_similarity")]

    def _rewrite_operator_symbols(self, sql: str) -> str:
        """Batch-12 sweep — operator symbols (DuckDB-verified):

        - ``^`` and ``**`` are POWER in DuckDB; Spark's ``^`` is XOR —
          2 ^ 3 is 8 vs 1, a silent wrong answer → power(a, b). Runs
          BEFORE _rewrite_divide_xor, whose xor() output ^ must stay.
        - ``~``/``!~`` are regexp match → [NOT] RLIKE (infix only — a
          prefix ~ is bitwise NOT in both engines and left alone);
          ``~~``/``~~*``/negations → LIKE/ILIKE keywords.
        - ``<->`` / ``<=>`` are array euclidean distance / cosine
          SIMILARITY → the list metric translations of batch 11.
          (Spark's own null-safe ``<=>`` is not part of the DuckDB
          dialect this gateway serves.)
        Operand extraction is atomic (literal / identifier / balanced
        group + postfix chains) — matching DuckDB's precedence, where
        power and the metric operators bind tighter than arithmetic.
        """
        # keyword operators first (plain splice, no operand parsing);
        # scan literal-aware, longest-first, including bare infix ~
        out = []
        last = ""  # last non-space char emitted (outside literals)
        i, n = 0, len(sql)
        while i < n:
            c = sql[i]
            if c == "'":
                k = sql.find("'", i + 1)
                k = n if k == -1 else k + 1
                out.append(sql[i:k])
                last = "'"
                i = k
                continue
            hit = next(
                ((op, kw) for op, kw in self._LIKE_OPS if sql.startswith(op, i)),
                None,
            )
            if hit:
                out.append(hit[1])
                last = " "
                i += len(hit[0])
                continue
            if (
                c == "~"
                and not sql.startswith("~~", i)
                and (last.isalnum() or last in "_.')]")
            ):
                out.append(" RLIKE ")
                last = " "
                i += 1
                continue
            out.append(c)
            if not c.isspace():
                last = c
            i += 1
        sql = "".join(out)
        # function-style operators: need both operands
        for op, fn in self._FN_OPS + [("^", "power")]:
            while True:
                idx = None
                i, in_lit = 0, False
                while i < len(sql):
                    ch = sql[i]
                    if ch == "'":
                        in_lit = not in_lit
                    elif not in_lit and sql.startswith(op, i):
                        idx = i
                        break
                    i += 1
                if idx is None:
                    break
                ls = self._atom_left(sql, idx)
                re_ = self._atom_right(sql, idx + len(op))
                if ls is None or re_ is None:
                    raise UQueryError.sql_error(
                        f"cannot parse operands of '{op}' (use {fn}(a, b))"
                    )
                left = sql[ls:idx].strip()
                right = sql[idx + len(op) : re_].strip()
                sql = sql[:ls] + f"{fn}(({left}), ({right}))" + sql[re_:]
        return sql

    # -- sweep batch 8: scalar-function semantics ---------------------------

    _CONCAT_RE = re.compile(r"(?i)\bconcat\s*\(")
    _LOG_RE = re.compile(r"(?i)\blog\s*\(")
    _SUBSTRING_RE = re.compile(r"(?i)\bsubstr(?:ing)?\s*\(")
    _EVEN_RE = re.compile(r"(?i)\beven\s*\(")
    _FDIV_RE = re.compile(r"(?i)\bfdiv\s*\(")
    _FMOD_RE = re.compile(r"(?i)\bfmod\s*\(")
    _ISFIN_RE = re.compile(r"(?i)\bis(finite|inf)\s*\(")
    _LIST_UNIQUE_RE = re.compile(r"(?i)\b(?:list|array)_unique\s*\(")
    _FORMAT_BYTES_RE = re.compile(r"(?i)\bformat_bytes\s*\(")
    _CURRENT_SCHEMA_RE = re.compile(r"(?i)\bcurrent_schema\s*\(\s*\)")
    _POS_INT_RE = re.compile(r"^\s*\+?\d+\s*$")

    def _rewrite_scalar_semantics(self, sql: str) -> str:
        """Batch-8 sweep — silent scalar divergences (DuckDB-verified):

        - ``concat``: DuckDB stringifies EVERY argument and SKIPS NULLs
          (concat('a', NULL, 'b') = 'ab'; concat([1,2]) = '[1, 2]');
          Spark concat is NULL-propagating and type-generic →
          concat_ws('', CAST(each AS STRING)). Runs BEFORE
          _rewrite_list_nulls so that pass's generated array concat()
          is never touched. Deviation: scientific-notation float
          formatting differs ('1.5e-07' vs '1.5E-7').
        - one-arg ``log``: DuckDB log10, Spark ln → log10. (2-arg
          log(base, x) agrees.)
        - 3-arg ``substring``/``substr``: DuckDB uses a character-window
          rule — start 0 or negative starts count a virtual window that
          is CLIPPED to the string, negative lengths walk backward
          (substring('abcdef', 0, 3) = 'ab', (-10, 8) = 'abcd',
          (2, -1) = 'a'); Spark clamps start to 1. The general window
          form: b = s>0 ? s : s=0 ? 0 : len+s+1, window
          [min(b, b+L), max(b, b+L)) ∩ [1, len+1]. Calls with literal
          start >= 1 and literal length >= 0 (the common case) are left
          native — both engines agree there.
        - ``even``: round away from zero to the next even integer.
        - ``fdiv``/``fmod``: DuckDB's are FLOORED division/modulo (sign
          of the divisor: fmod(-7.5, 2) = 0.5, fmod(7.5, -2) = -0.5);
          Spark % truncates → ((a % b) + b) % b, floor(a/b); DOUBLE
          like DuckDB.
        - ``isfinite``/``isinf`` (no Spark builtin) → isnan/Infinity
          arithmetic; isnan agrees natively.
        - ``list_unique``/``array_unique`` → count of distinct
          non-NULL elements.
        - ``format_bytes`` → binary-unit CASE chain ('1.0 KiB').
        - ``current_schema()`` → 'main' (DuckDB's default schema — the
          gateway serves DuckDB-dialect clients).
        """
        # concat: must split args to cast each
        while True:
            hit = self._call_args(self._CONCAT_RE, sql)
            if not hit:
                break
            m, close, args = hit
            inner = ", ".join(f"CAST(({a}) AS STRING)" for a in args)
            sql = sql[: m.start()] + f"concat_ws('', {inner})" + sql[close + 1 :]
        # one-arg log
        pos = 0
        while True:
            hit = self._call_args(self._LOG_RE, sql, pos)
            if not hit:
                break
            m, close, args = hit
            if len(args) == 1:
                sql = sql[: m.start()] + f"log10({args[0]})" + sql[close + 1 :]
                pos = m.start()
            else:
                pos = m.end()
        # 3-arg substring window rule
        pos = 0
        while True:
            hit = self._call_args(self._SUBSTRING_RE, sql, pos)
            if not hit:
                break
            m, close, args = hit
            if len(args) != 3 or (
                self._POS_INT_RE.match(args[1])
                and int(args[1]) >= 1
                and self._POS_INT_RE.match(args[2])
            ):
                # scan INSIDE the skipped native call — a nested substr
                # with 0/negative args must still translate (fuzzer
                # catch, batch 28 — the left/right class)
                pos = m.end()
                continue
            # nested substr in the args translates first (the repl
            # embeds s many times; skipping past hid inner windows)
            s, st, ln = (self._rewrite_scalar_semantics(a) for a in args)
            b = (
                f"(CASE WHEN ({st}) > 0 THEN ({st}) WHEN ({st}) = 0 THEN 0 "
                f"ELSE length(({s})) + ({st}) + 1 END)"
            )
            lo = f"GREATEST(LEAST({b}, {b} + ({ln})), 1)"
            hi = f"LEAST(GREATEST({b}, {b} + ({ln})), length(({s})) + 1)"
            repl = (
                f"(CASE WHEN ({s}) IS NULL OR ({st}) IS NULL OR ({ln}) IS NULL "
                f"THEN NULL WHEN {hi} > {lo} "
                f"THEN substring(({s}), {lo}, {hi} - {lo}) ELSE '' END)"
            )
            sql = sql[: m.start()] + repl + sql[close + 1 :]
            pos = m.start() + len(repl)
        # simple 1-2 arg templates
        for regex, n_args, tmpl in (
            (
                self._EVEN_RE,
                1,
                "(CASE WHEN ({a}) >= 0 THEN CAST(2 * ceil(({a}) / 2.0) AS DOUBLE) "
                "ELSE CAST(2 * floor(({a}) / 2.0) AS DOUBLE) END)",
            ),
            (self._FDIV_RE, 2, "CAST(floor(({a}) / ({b})) AS DOUBLE)"),
            (
                self._FMOD_RE,
                2,
                "CAST(((({a}) % ({b})) + ({b})) % ({b}) AS DOUBLE)",
            ),
            (
                # DuckDB ≥1.1 counts NULL as ONE distinct element
                # (docs example: list_unique([1,1,NULL,-3,-3,-3]) = 3);
                # the local 1.0.0 binary excludes it (probed: 2) — the
                # round-10 battery36 driver hash-fail. Semantics follow
                # the reference's pinned 1.5.2 (Cargo.toml:11): Spark's
                # array_distinct keeps NULL, so no compact.
                self._LIST_UNIQUE_RE,
                1,
                "size(array_distinct(({a})))",
            ),
        ):
            while True:
                hit = self._call_args(regex, sql)
                if not hit:
                    break
                m, close, args = hit
                if len(args) != n_args:
                    raise UQueryError.sql_error(
                        f"{m.group(0).strip('( ')} expects {n_args} arg(s)"
                    )
                repl = tmpl.format(a=args[0], b=args[-1])
                sql = sql[: m.start()] + repl + sql[close + 1 :]
        # isfinite / isinf
        while True:
            hit = self._call_args(self._ISFIN_RE, sql)
            if not hit:
                break
            m, close, args = hit
            if len(args) != 1:
                raise UQueryError.sql_error("isfinite/isinf expect 1 arg")
            a = args[0]
            if m.group(1).lower() == "inf":
                repl = f"(abs(CAST(({a}) AS DOUBLE)) = CAST('Infinity' AS DOUBLE))"
            else:
                repl = (
                    f"(NOT isnan(CAST(({a}) AS DOUBLE)) AND "
                    f"abs(CAST(({a}) AS DOUBLE)) <> CAST('Infinity' AS DOUBLE))"
                )
            sql = sql[: m.start()] + repl + sql[close + 1 :]
        # format_bytes
        while True:
            hit = self._call_args(self._FORMAT_BYTES_RE, sql)
            if not hit:
                break
            m, close, args = hit
            if len(args) != 1:
                raise UQueryError.sql_error("format_bytes expects 1 arg")
            a = args[0]
            units = [("PiB", 1024 ** 5), ("TiB", 1024 ** 4), ("GiB", 1024 ** 3),
                     ("MiB", 1024 ** 2), ("KiB", 1024)]
            # DuckDB picks the unit on |x| (negative inputs keep their
            # unit: -2048 → '-2.0 KiB') and TRUNCATES toward zero at
            # one decimal (1234567 → '1.1 MiB', never '1.2') — the ×10
            # DIV trick truncates exactly (round-8 gap-probe catch;
            # %.1f on the plain quotient ROUNDS)
            branches = " ".join(
                f"WHEN abs(CAST(({a}) AS BIGINT)) >= {size} THEN "
                f"format_string('%.1f {u}', "
                f"CAST(CAST(({a}) AS BIGINT) * 10 DIV {size} AS DOUBLE) / 10)"
                for u, size in units
            )
            repl = (
                f"(CASE {branches} ELSE concat_ws('', CAST(({a}) AS STRING), "
                f"' bytes') END)"
            )
            sql = sql[: m.start()] + repl + sql[close + 1 :]
        sql = self._CURRENT_SCHEMA_RE.sub("'main'", sql)
        return sql

    # -- sweep batch 9: aggregate-function semantics ------------------------

    _SKEW_KURT_RE = re.compile(r"(?i)\b(skewness|skew|kurtosis)\s*\(")
    _ANY_VALUE_RE = re.compile(r"(?i)\bany_value\s*\(")
    _FAVG_RE = re.compile(r"(?i)\b(favg|fsum|kahan_sum|sumkahan)\s*\(")
    _KURT_POP_RE = re.compile(r"(?i)\bkurtosis_pop\s*\(")
    _SEM_RE = re.compile(r"(?i)\bsem\s*\(")
    _ARG_NULL_RE = re.compile(r"(?i)\barg_(min|max)_null\s*\(")
    _GEOMEAN_RE = re.compile(r"(?i)\b(?:geomean|geometric_mean)\s*\(")
    _AGG_ORDER_RE = re.compile(r"(?i)\b(sum|avg|count|min|max)\s*\(")
    _FILTER_NO_WHERE_RE = re.compile(r"(?i)(\)\s*filter\s*\(\s*)(?!where\b)")

    def _rewrite_agg_semantics(self, sql: str) -> str:
        """Batch-9 sweep — aggregate semantics (DuckDB-verified):

        - ``skewness``/``kurtosis``: DuckDB computes the SAMPLE
          estimators (G1, excess G2), Spark the population ones (g1,
          g2) — a silent near-miss that survives round(4) only for
          large n (n=500: 0.007013 vs 0.006992). Corrected via the
          standard factors: G1 = g1·sqrt(n(n-1))/(n-2),
          G2 = (n-1)/((n-2)(n-3))·((n+1)g2 + 6); small-n divisions hit
          0 and yield NULL exactly where DuckDB returns NULL. Window
          (OVER) usage raises — the correction would need the same
          frame on count().
        - ``any_value``: DuckDB SKIPS NULLs (returns the first
          non-NULL); Spark's default takes the first row →
          any_value(x, true). ``arbitrary`` (first row, NULL included)
          maps to plain any_value via _FN_RENAMES.
        - ``favg``/``fsum`` (Kahan-compensated) → avg/sum over DOUBLE.
        - ``geomean`` → exp(avg(ln(x))).
        - ORDER BY inside order-INSENSITIVE aggregates (sum/avg/count/
          min/max admit it in DuckDB as a no-op) is stripped.
        - aggregate ``FILTER (cond)`` without the WHERE keyword gains
          it (Spark requires FILTER (WHERE …)).
        """
        pos = 0
        while True:
            m = self._search_code(self._SKEW_KURT_RE, sql, pos)
            if not m:
                break
            close = self._find_close(sql, sql.index("(", m.end() - 1))
            if close == -1:
                break
            a = sql[m.end() : close]
            if re.match(r"(?i)over\b", sql[close + 1 :].lstrip()):
                raise UQueryError.sql_error(
                    "skewness/kurtosis OVER windows are not supported "
                    "(sample-estimator correction needs a framed count)"
                )
            if re.match(r"(?i)\s*distinct\b", a):
                raise UQueryError.sql_error(
                    "skewness/kurtosis DISTINCT is not supported"
                )
            n = f"count(({a}))"
            # try_divide: n <= 2 (skew) / n <= 3 (kurt) hit a zero divisor
            # and must yield NULL like DuckDB — ANSI mode would throw
            if m.group(1).lower() == "kurtosis":
                repl = (
                    f"(try_divide({n} - 1, ({n} - 2) * ({n} - 3)) * "
                    f"(({n} + 1) * kurtosis(({a})) + 6))"
                )
            else:
                repl = (
                    f"try_divide(skewness(({a})) * sqrt({n} * ({n} - 1)), {n} - 2)"
                )
            sql = sql[: m.start()] + repl + sql[close + 1 :]
            pos = m.start() + len(repl)
        pos = 0
        while True:
            hit = self._call_args(self._ANY_VALUE_RE, sql, pos)
            if not hit:
                break
            m, close, args = hit
            if len(args) != 1:
                pos = m.end()  # already 2-arg (our own output) — leave
                continue
            if re.search(r"(?i)\border\s+by\b", args[0]):
                pos = m.end()  # ordered form — batch-18 pass below
                continue
            sql = sql[: m.start()] + f"any_value(({args[0]}), true)" + sql[close + 1 :]
        # wave-5 closes (round 10): kurtosis_pop is Spark's NATIVE
        # kurtosis (population excess g2 — DuckDB-verified numerically);
        # it must map AFTER the sample-correction loop above, which
        # would otherwise re-correct the emitted native call. sem =
        # stddev_pop / sqrt(n) (probed: sem of one value is 0.0, so the
        # POPULATION deviation, not samp); arg_min_null/arg_max_null
        # keep NULL-valued rows → Spark's bare min_by/max_by (the skip
        # wrap in _rewrite_b28_aggs exists precisely because the bare
        # forms DON'T skip).
        while True:
            hit = self._call_args(self._KURT_POP_RE, sql)
            if not hit:
                break
            m, close, args = hit
            if len(args) != 1:
                raise UQueryError.sql_error("kurtosis_pop expects 1 arg")
            sql = sql[: m.start()] + f"kurtosis(({args[0]}))" + sql[close + 1 :]
        while True:
            hit = self._call_args(self._SEM_RE, sql)
            if not hit:
                break
            m, close, args = hit
            if len(args) != 1:
                raise UQueryError.sql_error("sem expects 1 arg")
            a = args[0]
            sql = (
                sql[: m.start()]
                + f"try_divide(stddev_pop(CAST(({a}) AS DOUBLE)), sqrt(count(({a}))))"
                + sql[close + 1 :]
            )
        while True:
            hit = self._call_args(self._ARG_NULL_RE, sql)
            if not hit:
                break
            m, close, args = hit
            if len(args) != 2:
                raise UQueryError.sql_error("arg_min_null/arg_max_null expect 2 args")
            fn = "min_by" if m.group(1).lower() == "min" else "max_by"
            # struct-wrap the value: Spark 4.1's min_by/max_by SKIP
            # rows whose value is NULL, but arg_*_null exists precisely
            # to keep them — a struct is non-NULL even when its field is
            sql = (
                sql[: m.start()]
                + f"({fn}(named_struct('v', ({args[0]})), ({args[1]})).v)"
                + sql[close + 1 :]
            )
        while True:
            hit = self._call_args(self._FAVG_RE, sql)
            if not hit:
                break
            m, close, args = hit
            if len(args) != 1:
                raise UQueryError.sql_error("favg/fsum/kahan_sum expect 1 arg")
            fn = "avg" if m.group(1).lower() == "favg" else "sum"
            sql = (
                sql[: m.start()]
                + f"{fn}(CAST(({args[0]}) AS DOUBLE))"
                + sql[close + 1 :]
            )
        while True:
            hit = self._call_args(self._GEOMEAN_RE, sql)
            if not hit:
                break
            m, close, args = hit
            if len(args) != 1:
                raise UQueryError.sql_error("geomean expects 1 arg")
            sql = (
                sql[: m.start()]
                + f"exp(avg(ln(CAST(({args[0]}) AS DOUBLE))))"
                + sql[close + 1 :]
            )
        # strip no-op ORDER BY inside order-insensitive aggregates
        pos = 0
        while True:
            m = self._search_code(self._AGG_ORDER_RE, sql, pos)
            if not m:
                break
            close = self._find_close(sql, sql.index("(", m.end() - 1))
            if close == -1:
                break
            inner = sql[m.end() : close]
            ob = next(
                (s for s, _e, _w in self._scan_top_level(inner, {"order"})), None
            )
            if ob is not None and re.match(r"(?i)order\s+by\b", inner[ob:]):
                sql = sql[: m.end()] + inner[:ob].rstrip() + sql[close:]
                pos = m.start()
            else:
                pos = m.end()
        sql = self._FILTER_NO_WHERE_RE.sub(lambda mm: mm.group(1) + "WHERE ", sql)
        # arbitrary = first row's value, NULL included — Spark any_value's
        # DEFAULT. Renamed here (not _FN_RENAMES) so the any_value loop
        # above never adds ", true" to it.
        sql = re.sub(r"(?i)\barbitrary\s*\(", "any_value(", sql)
        return sql

    # -- sweep batch 10: datetime corners -----------------------------------

    _EXTRACT_SPECIAL_RE = re.compile(
        r"(?i)\bextract\s*\(\s*(dow|dayofweek|weekday|epoch|microseconds|"
        r"milliseconds|isodow|yearweek|century|isoyear|week|era|decade|"
        r"millennium)\s+from\b"
    )
    _ERA_FN_RE = re.compile(r"(?i)\bera\s*\(")
    _DOW_FAMILY_RE = re.compile(r"(?i)\b(dow|dayofweek|weekday)\s*\(")
    _SUBSECOND_RE = re.compile(r"(?i)\b(microseconds|milliseconds)\s*\(")
    _JULIAN_RE = re.compile(r"(?i)\bjulian\s*\(")
    _DATE_SUB_RE = re.compile(r"(?i)\bdate_?sub\s*\(")
    _DATE_SUB_US = {
        "week": 7 * 86_400_000_000, "day": 86_400_000_000,
        "hour": 3_600_000_000, "minute": 60_000_000, "second": 1_000_000,
    }

    def _rewrite_datetime_corners(self, sql: str) -> str:
        """Batch-10 sweep — datetime numbering and diff corners
        (DuckDB-verified):

        - EXTRACT of DuckDB-specific fields is converted to the
          function form (``EXTRACT(epoch FROM x)`` → ``epoch(x)``) and
          picked up by the existing epoch/ISO rewrites below.
        - ``dow``/``dayofweek``/``weekday`` are all Sunday=0 in DuckDB;
          Spark's dayofweek is Sunday=1 and weekday is Monday=0 →
          (dayofweek(x) - 1). A silent off-by-one (or worse, for
          weekday).
        - ``microseconds``/``milliseconds`` include the SECONDS
          component (1.5 s → 1_500_000 µs) → date_format('ss.SSSSSS')
          arithmetic.
        - ``julian`` → 2440588 + epoch-days (DuckDB's civil-midnight
          convention; noon = .5).
        - ``date_sub``/``datesub``('unit', a, b) counts COMPLETE units
          (truncated toward zero, month-end clamped: Jan 31 → Feb 29
          is one complete month) → months_between truncation for the
          month family, exact microsecond `div` for day and smaller.
          NOT Spark's two-arg date_sub (day subtraction) — DuckDB's is
          always the 3-arg form; 2-arg calls are left native.
        """
        # batch 28 (temporal fuzzer): datepart/date_part with a LITERAL
        # engine-numbered part string bypassed the conversions below
        # (datepart('dow', x) reached Spark's Sunday-1 date_part) —
        # route it to the same function forms EXTRACT uses
        pos28 = 0
        dp_re = re.compile(
            r"(?i)\b(?:date_part|datepart)\s*\(\s*'(dow|dayofweek|weekday|"
            r"isodow|epoch|microseconds|milliseconds|week|yearweek|century|"
            r"decade|millennium|julian|era)'\s*,"
        )
        while True:
            m = self._search_code(dp_re, sql, pos28)
            if not m:
                break
            open_i = sql.index("(", m.start())
            close = self._find_close(sql, open_i)
            if close == -1:
                break
            fld = m.group(1).lower()
            e = sql[m.end() : close]
            repl = f"{fld}({e})"
            sql = sql[: m.start()] + repl + sql[close + 1 :]
            pos28 = m.start()
        # round 8 (TIME-graduation probe catch, applies to TIMESTAMP and
        # INTERVAL too): DuckDB's EXTRACT(SECOND ...) is a truncated
        # BIGINT (…45.5 → 45) where Spark returns DECIMAL(8,6) 45.5 —
        # a silent wrong-value class. CAST wraps the native extract
        # (covers time/timestamp/interval; toward-zero truncation
        # matches for negative intervals).
        sec_re = re.compile(
            r"(?i)\bextract\s*\(\s*(?:second|seconds|secs|sec)\s+from\b"
        )
        dpsec_re = re.compile(
            r"(?i)\b(?:date_part|datepart)\s*\(\s*"
            r"'(?:second|seconds|secs|sec|s)'\s*,"
        )
        possec = 0
        while True:
            m = self._search_code(sec_re, sql, possec)
            if not m:
                break
            open_i = sql.index("(", m.start())
            close = self._find_close(sql, open_i)
            if close == -1:
                break
            # DIV 1, not CAST: Spark's decimal->integral cast ROUNDS
            # (45.5 -> 46) where DuckDB truncates toward zero
            repl = f"CAST(({sql[m.start() : close + 1]}) DIV 1 AS BIGINT)"
            sql = sql[: m.start()] + repl + sql[close + 1 :]
            possec = m.start() + len(repl)
        possec = 0
        while True:
            m = self._search_code(dpsec_re, sql, possec)
            if not m:
                break
            open_i = sql.index("(", m.start())
            close = self._find_close(sql, open_i)
            if close == -1:
                break
            e = sql[m.end() : close]
            repl = f"CAST((EXTRACT(SECOND FROM {e})) DIV 1 AS BIGINT)"
            sql = sql[: m.start()] + repl + sql[close + 1 :]
            possec = m.start() + len(repl)
        while True:
            m = self._search_code(self._EXTRACT_SPECIAL_RE, sql)
            if not m:
                break
            open_i = sql.index("(", m.start())
            close = self._find_close(sql, open_i)
            if close == -1:
                break
            fld = m.group(1).lower()
            e = sql[m.end() : close]
            sql = sql[: m.start()] + f"{fld}({e})" + sql[close + 1 :]
        # era: CE = 1, BC = 0 (batch 15; DuckDB-verified — year <= 0 is
        # BC in the proleptic calendar). Both EXTRACT (converted above)
        # and the function form.
        while True:
            hit = self._call_args(self._ERA_FN_RE, sql)
            if not hit:
                break
            m, close, args = hit
            if len(args) != 1:
                raise UQueryError.sql_error("era expects 1 arg")
            repl = f"(CASE WHEN year(({args[0]})) >= 1 THEN 1 ELSE 0 END)"
            sql = sql[: m.start()] + repl + sql[close + 1 :]
        pos = 0
        while True:
            hit = self._call_args(self._DOW_FAMILY_RE, sql, pos)
            if not hit:
                break
            m, close, args = hit
            if len(args) != 1:
                raise UQueryError.sql_error("dow/dayofweek/weekday expect 1 arg")
            repl = f"(dayofweek(({args[0]})) - 1)"
            sql = sql[: m.start()] + repl + sql[close + 1 :]
            pos = m.start() + len(repl)
        while True:
            hit = self._call_args(self._SUBSECOND_RE, sql)
            if not hit:
                break
            m, close, args = hit
            if len(args) != 1:
                raise UQueryError.sql_error("microseconds/milliseconds expect 1 arg")
            scale = 1_000_000 if m.group(1).lower() == "microseconds" else 1000
            # floor BEFORE the cast: DuckDB milliseconds TRUNCATES the
            # microsecond remainder, and a bare fractional CAST would get
            # the DuckDB-cast rounding treatment from _rewrite_cast
            repl = (
                f"CAST(floor(CAST(date_format(CAST(({args[0]}) AS TIMESTAMP), "
                f"'ss.SSSSSS') AS DECIMAL(9,6)) * {scale}) AS BIGINT)"
            )
            sql = sql[: m.start()] + repl + sql[close + 1 :]
        while True:
            hit = self._call_args(self._JULIAN_RE, sql)
            if not hit:
                break
            m, close, args = hit
            if len(args) != 1:
                raise UQueryError.sql_error("julian expects 1 arg")
            repl = (
                f"(2440588.0 + CAST(unix_micros(CAST(({args[0]}) AS TIMESTAMP)) "
                f"AS DOUBLE) / 86400000000.0)"
            )
            sql = sql[: m.start()] + repl + sql[close + 1 :]
        pos = 0
        while True:
            hit = self._call_args(self._DATE_SUB_RE, sql, pos)
            if not hit:
                break
            m, close, args = hit
            if len(args) != 3:
                pos = m.end()  # Spark's own 2-arg date_sub — leave native
                continue
            unit = (self._lit_parse(args[0]) or "").lower().rstrip("s")
            unit = {"mon": "month", "yr": "year", "min": "minute", "sec": "second"}.get(unit, unit)
            a = f"CAST(({args[1]}) AS TIMESTAMP)"
            b = f"CAST(({args[2]}) AS TIMESTAMP)"
            if unit in ("year", "quarter", "month"):
                div = {"year": 12, "quarter": 3, "month": 1}[unit]
                mb = f"months_between({b}, {a})"
                # truncate toward zero explicitly — a bare CAST here would
                # get the DuckDB-cast ROUNDING treatment from
                # _rewrite_cast downstream (floor/ceil return BIGINT)
                repl = (
                    f"(CASE WHEN {mb} >= 0 THEN floor({mb} / {div}) "
                    f"ELSE ceil({mb} / {div}) END)"
                )
            elif unit in self._DATE_SUB_US:
                us = self._DATE_SUB_US[unit]
                repl = f"((unix_micros({b}) - unix_micros({a})) div {us})"
            else:
                raise UQueryError.sql_error(
                    f"date_sub: unsupported unit '{unit}'"
                )
            sql = sql[: m.start()] + repl + sql[close + 1 :]
            pos = m.start() + len(repl)
        return sql

    # -- sweep batch 11: string/list function corners -----------------------

    _LEFT_RIGHT_RE = re.compile(r"(?i)\b(left|right)\s*\(")
    _STRING_AGG1_RE = re.compile(r"(?i)\b(?:string_agg|group_concat)\s*\(")
    _CHR_RE = re.compile(r"(?i)\bchr\s*\(")
    _PARSE_FILENAME_RE = re.compile(r"(?i)\bparse_filename\s*\(")
    _LIST_METRIC_RE = re.compile(
        r"(?i)\b(?:list|array)_(cosine_similarity|cosine_distance|"
        r"negative_inner_product|negative_dot_product|"
        r"inner_product|dot_product|distance)\s*\("
    )
    _JACCARD_RE = re.compile(r"(?i)\bjaccard\s*\(")
    _REGEXP_FULL_RE = re.compile(r"(?i)\bregexp_full_match\s*\(")
    _LIKE_ESCAPE_RE = re.compile(r"(?i)\b(not_)?(i?)like_escape\s*\(")

    def _rewrite_string_list_corners(self, sql: str) -> str:
        """Batch-11 sweep (DuckDB-verified):

        - ``left``/``right`` with NEGATIVE n drop |n| characters from
          the other end in DuckDB; Spark returns '' → length-relative
          CASE. Positive-literal calls stay native.
        - 1-arg ``string_agg``/``group_concat`` defaults the separator
          to ',' in DuckDB; Spark's concatenates bare → ',' inserted.
        - ``chr`` beyond 255: Spark's char() is mod-256 — a codepoint
          is UTF-8-encoded by hand (2/3/4-byte branches) and decoded.
        - ``parse_filename`` → trailing path component.
        - ``list_cosine_similarity``/``list_distance``/
          ``list_inner_product`` (+ array_/dot aliases) → zip_with /
          aggregate arithmetic over DOUBLE.
        - ``jaccard`` → character-set Jaccard via split + set algebra.
        - ``regexp_full_match`` → anchored RLIKE.
        - ``like_escape``/``ilike_escape`` → LIKE/ILIKE … ESCAPE.
        ``hash()`` stays native and engine-specific (documented — like
        random(), its VALUES are not portable, only its distribution).
        """
        pos = 0
        while True:
            hit = self._call_args(self._LEFT_RIGHT_RE, sql, pos)
            if not hit:
                break
            m, close, args = hit
            if len(args) != 2 or (
                self._POS_INT_RE.match(args[1]) and int(args[1]) >= 0
            ):
                # scan INSIDE the skipped call — right(right(s, -1), 1)
                # has a negative inner call (fuzzer catch, batch 28)
                pos = m.end()
                continue
            fn = m.group(1).lower()
            # nested left/right in the args translate first (the repl
            # embeds s twice; skipping past it hid inner negatives)
            s, n = (self._rewrite_string_list_corners(a) for a in args)
            repl = (
                f"{fn}(({s}), CASE WHEN ({n}) < 0 "
                f"THEN GREATEST(length(({s})) + ({n}), 0) ELSE ({n}) END)"
            )
            sql = sql[: m.start()] + repl + sql[close + 1 :]
            pos = m.start() + len(repl)
        pos = 0
        while True:
            hit = self._call_args(self._STRING_AGG1_RE, sql, pos)
            if not hit:
                break
            m, close, args = hit
            is_gc = "group_concat" in m.group(0).lower()
            if len(args) == 1:
                a = args[0]
                ob = next(
                    (s for s, _e, _w in self._scan_top_level(a, {"order"})), None
                )
                if ob is not None and re.match(r"(?i)order\s+by\b", a[ob:]):
                    # keep the in-args ORDER BY adjacent to the separator so
                    # the string_agg_order pass converts it to WITHIN GROUP
                    repl = f"string_agg({a[:ob].rstrip()}, ',' {a[ob:]})"
                else:
                    repl = f"string_agg(({a}), ',')"
            elif is_gc and len(args) == 2:
                repl = f"string_agg({args[0]}, {args[1]})"
            else:
                pos = m.end()
                continue
            sql = sql[: m.start()] + repl + sql[close + 1 :]
            pos = m.start() + len(repl)
        while True:
            hit = self._call_args(self._CHR_RE, sql)
            if not hit:
                break
            m, close, args = hit
            if len(args) != 1:
                raise UQueryError.sql_error("chr expects 1 arg")
            c = f"({args[0]})"
            hx = lambda e: f"lpad(conv({e}, 10, 16), 2, '0')"  # noqa: E731
            two = f"concat_ws('', {hx(f'192 + {c} div 64')}, {hx(f'128 + {c} % 64')})"
            three = (
                f"concat_ws('', {hx(f'224 + {c} div 4096')}, "
                f"{hx(f'128 + ({c} div 64) % 64')}, {hx(f'128 + {c} % 64')})"
            )
            four = (
                f"concat_ws('', {hx(f'240 + {c} div 262144')}, "
                f"{hx(f'128 + ({c} div 4096) % 64')}, "
                f"{hx(f'128 + ({c} div 64) % 64')}, {hx(f'128 + {c} % 64')})"
            )
            repl = (
                f"(CASE WHEN {c} < 128 THEN char({c}) "
                f"WHEN {c} < 2048 THEN decode(unhex({two}), 'UTF-8') "
                f"WHEN {c} < 65536 THEN decode(unhex({three}), 'UTF-8') "
                f"ELSE decode(unhex({four}), 'UTF-8') END)"
            )
            sql = sql[: m.start()] + repl + sql[close + 1 :]
        while True:
            hit = self._call_args(self._PARSE_FILENAME_RE, sql)
            if not hit:
                break
            m, close, args = hit
            if len(args) != 1:
                raise UQueryError.sql_error("parse_filename expects 1 arg (path)")
            repl = f"regexp_extract(({args[0]}), '([^/\\\\\\\\]*)$', 1)"
            sql = sql[: m.start()] + repl + sql[close + 1 :]
        while True:
            hit = self._call_args(self._LIST_METRIC_RE, sql)
            if not hit:
                break
            m, close, args = hit
            if len(args) != 2:
                raise UQueryError.sql_error("list metric functions expect 2 args")
            a = f"transform(({args[0]}), uq_lm -> CAST(uq_lm AS DOUBLE))"
            b = f"transform(({args[1]}), uq_lm -> CAST(uq_lm AS DOUBLE))"
            dot = (
                f"aggregate(zip_with({a}, {b}, (uq_x, uq_y) -> uq_x * uq_y), "
                f"0D, (uq_acc, uq_v) -> uq_acc + uq_v)"
            )
            kind = m.group(1).lower()
            if kind in ("inner_product", "dot_product"):
                repl = f"({dot})"
            elif kind in ("negative_inner_product", "negative_dot_product"):
                # DuckDB >=1.1 names (the reference pins 1.5.2):
                # documented as -inner_product
                repl = f"(-({dot}))"
            elif kind == "cosine_distance":
                # DuckDB >=1.1: 1 - cosine_similarity (doc-unambiguous)
                norm = lambda v: (  # noqa: E731
                    f"sqrt(aggregate(transform({v}, uq_w -> uq_w * uq_w), "
                    f"0D, (uq_acc, uq_v) -> uq_acc + uq_v))"
                )
                repl = f"(1D - (({dot}) / ({norm(a)} * {norm(b)})))"
            elif kind == "distance":
                repl = (
                    f"sqrt(aggregate(zip_with({a}, {b}, "
                    f"(uq_x, uq_y) -> (uq_x - uq_y) * (uq_x - uq_y)), "
                    f"0D, (uq_acc, uq_v) -> uq_acc + uq_v))"
                )
            else:  # cosine_similarity
                norm = lambda v: (  # noqa: E731
                    f"sqrt(aggregate(transform({v}, uq_w -> uq_w * uq_w), "
                    f"0D, (uq_acc, uq_v) -> uq_acc + uq_v))"
                )
                repl = f"(({dot}) / ({norm(a)} * {norm(b)}))"
            sql = sql[: m.start()] + repl + sql[close + 1 :]
        # batch-12 additions: remaining map/list functions
        for regex, n_args, tmpl in (
            (
                re.compile(r"(?i)\bmap_extract\s*\("),
                2,
                # DuckDB returns a single-element LIST ([] when missing)
                "filter(array(try_element_at(({a}), ({b}))), uq_mv -> uq_mv IS NOT NULL)",
            ),
            (
                re.compile(r"(?i)\b(?:list|array)_reverse_sort\s*\("),
                1,
                "sort_array(({a}), false)",
            ),
            (
                re.compile(r"(?i)\blist_reverse\s*\("),
                1,
                "reverse(({a}))",
            ),
            (
                re.compile(r"(?i)\blist_select\s*\("),
                2,
                "transform(({b}), uq_si -> try_element_at(({a}), uq_si))",
            ),
            (
                re.compile(r"(?i)\blist_histogram\s*\("),
                1,
                # r13 wave-15 (was UNRESOLVED_ROUTINE): MAP of value →
                # BIGINT count, keys ascending, NULL elements skipped;
                # NULL or effectively-empty list → NULL (all probed on
                # 1.0.0). Catalyst CSE dedups the repeated filter.
                "(CASE WHEN ({a}) IS NULL OR "
                "size(filter(({a}), uq_hv -> uq_hv IS NOT NULL)) = 0 "
                "THEN NULL ELSE map_from_arrays("
                "array_sort(array_distinct("
                "filter(({a}), uq_hv -> uq_hv IS NOT NULL))), "
                "transform(array_sort(array_distinct("
                "filter(({a}), uq_hv -> uq_hv IS NOT NULL))), "
                "uq_hk -> CAST(size(filter(({a}), "
                "uq_he -> uq_he = uq_hk)) AS BIGINT))) END)",
            ),
            (
                re.compile(r"(?i)\blist_grade_up\s*\("),
                1,
                # indices that would sort the list ascending, ties stable.
                # Explicit comparator: NULL elements grade LAST (DuckDB-
                # probed: grade_up([NULL,2,1]) = [3,2,1]; stable among
                # themselves) where Spark's struct sort put a NULL field
                # FIRST — a silent wrong value the r13 gap probe caught.
                "transform(array_sort(zip_with(({a}), sequence(1, size(({a}))), "
                "(uq_v, uq_i) -> struct(uq_v AS v, uq_i AS i)), "
                "(uq_l, uq_r) -> CASE "
                "WHEN uq_l.v IS NULL AND uq_r.v IS NULL "
                "THEN IF(uq_l.i < uq_r.i, -1, 1) "
                "WHEN uq_l.v IS NULL THEN 1 "
                "WHEN uq_r.v IS NULL THEN -1 "
                "WHEN uq_l.v < uq_r.v THEN -1 "
                "WHEN uq_l.v > uq_r.v THEN 1 "
                "ELSE IF(uq_l.i < uq_r.i, -1, 1) END), uq_s -> uq_s.i)",
            ),
        ):
            while True:
                hit = self._call_args(regex, sql)
                if not hit:
                    break
                m, close, args = hit
                if len(args) != n_args:
                    raise UQueryError.sql_error(
                        f"{m.group(0).strip('( ')} expects {n_args} arg(s)"
                    )
                repl = tmpl.format(a=args[0], b=args[-1])
                sql = sql[: m.start()] + repl + sql[close + 1 :]
        while True:
            hit = self._call_args(self._JACCARD_RE, sql)
            if not hit:
                break
            m, close, args = hit
            if len(args) != 2:
                raise UQueryError.sql_error("jaccard expects 2 args")
            sa = f"array_distinct(split(({args[0]}), ''))"
            sb = f"array_distinct(split(({args[1]}), ''))"
            repl = (
                f"(CAST(size(array_intersect({sa}, {sb})) AS DOUBLE) / "
                f"size(array_union({sa}, {sb})))"
            )
            sql = sql[: m.start()] + repl + sql[close + 1 :]
        while True:
            hit = self._call_args(self._REGEXP_FULL_RE, sql)
            if not hit:
                break
            m, close, args = hit
            if len(args) != 2:
                raise UQueryError.sql_error("regexp_full_match expects 2 args")
            pat = self._lit_parse(args[1])
            if pat is None:
                raise UQueryError.sql_error(
                    "regexp_full_match: literal patterns only"
                )
            repl = f"(({args[0]}) RLIKE '^(?:{pat})$')"
            sql = sql[: m.start()] + repl + sql[close + 1 :]
        while True:
            hit = self._call_args(self._LIKE_ESCAPE_RE, sql)
            if not hit:
                break
            m, close, args = hit
            if len(args) != 3:
                raise UQueryError.sql_error("like_escape expects (string, pattern, escape)")
            esc = self._lit_parse(args[2])
            if esc is None or len(esc) != 1:
                raise UQueryError.sql_error(
                    "like_escape: escape must be a 1-char literal"
                )
            neg = "NOT " if m.group(1) else ""  # round 8: not_ variants
            op = "ILIKE" if (m.group(2) or "").lower() == "i" else "LIKE"
            pat_arg = args[1]
            pat = self._lit_parse(args[1])
            if pat is not None:
                # Spark rejects the escape char before an ORDINARY
                # character (ESC_IN_THE_MIDDLE) where DuckDB treats
                # esc+c as literal c (r13 probe batch B:
                # ilike_escape('AbC', 'a^bc', '^')) — drop the no-op
                # escapes from literal patterns; esc before %/_/esc
                # stays escaped
                out, i = [], 0
                while i < len(pat):
                    c = pat[i]
                    if c == esc and i + 1 < len(pat):
                        nxt = pat[i + 1]
                        if nxt in ("%", "_", esc):
                            out.append(c)
                        i += 1
                        out.append(pat[i])
                    else:
                        out.append(c)
                    i += 1
                pat_arg = "'" + "".join(out).replace("'", "''") + "'"
            repl = f"(({args[0]}) {neg}{op} ({pat_arg}) ESCAPE '{esc}')"
            sql = sql[: m.start()] + repl + sql[close + 1 :]
        return sql

    # -- sweep batch 7: hamming / to_base -----------------------------------

    _HAMMING_RE = re.compile(r"(?i)\b(?:hamming|mismatches)\s*\(")
    _TO_BASE_RE = re.compile(r"(?i)\bto_base\s*\(")

    def _rewrite_hamming_to_base(self, sql: str) -> str:
        """hamming(a, b) (alias mismatches) → character-wise zip_with
        compare; unequal lengths raise at RUNTIME via raise_error — the
        same failure DuckDB produces. to_base(n, b[, min_len]) →
        conv(n, 10, b) zero-padded; negative n raises like DuckDB
        (conv would silently wrap to unsigned)."""
        while True:
            hit = self._call_args(self._HAMMING_RE, sql)
            if not hit:
                break
            m, close, args = hit
            if len(args) != 2:
                raise UQueryError.sql_error("hamming expects exactly 2 args")
            a, b = args
            # batch 28 (unicode matrix): DuckDB hamming is BYTE-based
            # (equal BYTE lengths, byte compares — 'aa' vs 'aé' errors)
            from .functions.parity_udfs import register_parity_udfs

            register_parity_udfs(self.spark)
            repl = f"uq_hamming_bytes(({a}), ({b}))"
            sql = sql[: m.start()] + repl + sql[close + 1 :]
        while True:
            hit = self._call_args(self._TO_BASE_RE, sql)
            if not hit:
                break
            m, close, args = hit
            if len(args) not in (2, 3):
                raise UQueryError.sql_error("to_base expects (number, radix[, min_length])")
            a, b = args[0], args[1]
            core = f"conv(({a}), 10, ({b}))"
            if len(args) == 3:
                core = f"lpad({core}, GREATEST(length({core}), ({args[2]})), '0')"
            repl = (
                f"(CASE WHEN ({a}) < 0 "
                f"THEN raise_error('to_base: number must be >= 0') "
                f"ELSE {core} END)"
            )
            sql = sql[: m.start()] + repl + sql[close + 1 :]
        return sql

    # -- sweep batch 7: list-typed date_part, map_from_entries tuples ------

    _DATE_PART_LIST_RE = re.compile(r"(?i)\bdate_?part\s*\((?=\s*\[)")
    # 1:1-safe parts only (dow/isodow/week etc. have engine-specific
    # numbering handled by the scalar ISO rewrites; the list form keeps
    # to the unambiguous calendar fields)
    _DATE_PART_OK = {"year", "month", "day", "hour", "minute", "second", "quarter"}

    def _rewrite_date_part_list(self, sql: str) -> str:
        """DuckDB ``date_part(['year','month'], e)`` returns a STRUCT of
        the named parts → named_struct over Spark's scalar date_part.
        Runs before the bracket pass (the list must still be [...])."""
        hit = self._call_args(self._DATE_PART_LIST_RE, sql)
        if not hit:
            return sql
        m, close, args = hit
        tail = self._rewrite_date_part_list(sql[close + 1 :])
        if len(args) != 2:
            raise UQueryError.sql_error("date_part([...], expr) expects 2 args")
        lst = args[0].strip()
        if not (lst.startswith("[") and lst.endswith("]")):
            raise UQueryError.sql_error("date_part: part list must be a [...] literal")
        parts = []
        for p in self._split_top(lst[1:-1], ","):
            name = self._lit_parse(p.strip())
            if name is None or name.lower() not in self._DATE_PART_OK:
                raise UQueryError.sql_error(
                    f"date_part list: unsupported part {p.strip()[:20]!r} "
                    f"(supported: {sorted(self._DATE_PART_OK)})"
                )
            parts.append(name)
        e = args[1]
        fields = ", ".join(
            f"'{p}', date_part('{p.upper()}', ({e}))" for p in parts
        )
        return sql[: m.start()] + f"named_struct({fields})" + tail

    _MAP_ENTRIES_RE = re.compile(r"(?i)\bmap_from_entries\s*\(")

    def _rewrite_map_entries_tuples(self, sql: str) -> str:
        """DuckDB admits bare tuple literals in map_from_entries
        (``[('a', 1), …]``) — each top-level parenthesised tuple becomes
        struct(...). Runs before the bracket pass; struct-literal
        entries ({'k':…}) are handled by the struct-literal pass."""
        hit = self._call_args(self._MAP_ENTRIES_RE, sql)
        if not hit:
            return sql
        m, close, args = hit
        tail = self._rewrite_map_entries_tuples(sql[close + 1 :])
        if len(args) == 1:
            lst = args[0].strip()
            if lst.startswith("[") and lst.endswith("]"):
                out = []
                for el in self._split_top(lst[1:-1], ","):
                    el = el.strip()
                    if (
                        el.startswith("(")
                        and el.endswith(")")
                        and len(self._split_top(el[1:-1], ",")) > 1
                    ):
                        out.append(f"struct({el[1:-1]})")
                    else:
                        out.append(el)
                args = ["[" + ", ".join(out) + "]"]
        inner = ", ".join(args)
        return sql[: m.start()] + f"map_from_entries({inner})" + tail

    # -- sweep batch 7: lambda index args (DuckDB 1-based → Spark 0-based) --

    _LAMBDA_FN_RE = re.compile(r"(?i)\b(transform|filter)\s*\(")
    _LAMBDA2_RE = re.compile(
        r"^\s*\(\s*(?P<x>\w+)\s*,\s*(?P<i>\w+)\s*\)\s*->(?P<body>.*)$", re.S
    )

    def _rewrite_lambda_index(self, sql: str) -> str:
        """DuckDB list lambdas with an index arg — ``(x, i) -> …`` — are
        1-BASED; Spark's transform/filter two-arg lambdas are 0-based.
        The index variable is substituted with (i + 1) in the body.
        Runs right after the function renames (list_transform/list_filter
        are already transform/filter) and before any pass that emits its
        own — always single-arg — lambdas."""
        pos = 0
        while True:
            hit = self._call_args(self._LAMBDA_FN_RE, sql, pos)
            if not hit:
                break
            m, close, args = hit
            # recurse into the args FIRST so nested transform/filter
            # calls are shifted exactly once, then skip the whole span
            args = [self._rewrite_lambda_index(a) for a in args]
            if len(args) == 2:
                lm = self._LAMBDA2_RE.match(args[1])
                if lm:
                    idx = lm.group("i")
                    body = re.sub(
                        rf"\b{re.escape(idx)}\b", f"({idx} + 1)", lm.group("body")
                    )
                    args[1] = f"({lm.group('x')}, {idx}) -> {body}"
            repl = f"{m.group(1)}({', '.join(a.strip() for a in args)})"
            sql = sql[: m.start()] + repl + sql[close + 1 :]
            pos = m.start() + len(repl)
        return sql

    def _rewrite_list_index(self, sql: str) -> str:
        """list_element/list_extract/array_extract (1-based, negative
        from the end) → try_element_at with a zero-index guard: DuckDB
        returns NULL for index 0 and ANY out-of-bounds index, while
        ANSI element_at ERRORS on out-of-bounds and even try_element_at
        errors on 0 (batch-11 ANSI follow-up). Nonzero literal indices
        skip the guard."""
        while True:
            hit = self._call_args(self._LIST_INDEX_RE, sql)
            if not hit:
                break
            m, close, args = hit
            if len(args) != 2:
                raise UQueryError.sql_error("list_element/list_extract expect 2 args")
            a, i = args
            if re.fullmatch(r"\s*-?[1-9]\d*\s*", i):
                arr = f"try_element_at(({a}), ({i}))"
                s_form = f"substr(({a}), ({i}), 1)"
            else:
                arr = (
                    f"(CASE WHEN ({i}) = 0 THEN NULL "
                    f"ELSE try_element_at(({a}), ({i})) END)"
                )
                s_form = (
                    f"(CASE WHEN ({i}) = 0 THEN '' "
                    f"ELSE substr(({a}), ({i}), 1) END)"
                )
            # round-12 wave-13: these are STRING-polymorphic in DuckDB
            # (array_extract('abcd', 2) = 'b'; index 0 → '', any
            # out-of-bounds → '' — substr matches except index 0) →
            # uq_poly(fallback=string form, preferred=array form); the
            # LIMIT-0 probe picks whichever analyzes.
            repl = f"uq_poly({s_form}, {arr})"
            sql = sql[: m.start()] + repl + sql[close + 1 :]
        return sql

    def _rewrite_list_nulls(self, sql: str) -> str:
        """NULL-input semantics fixes (ADVICE r5, verified vs DuckDB
        1.0.0): ``list_concat(a, b)`` treats a NULL input as empty —
        NULL only when BOTH are NULL — where Spark ``concat`` is
        NULL-propagating; ``list_has_any(a, b)`` returns false (never
        NULL) for non-NULL inputs whose only shared element is NULL,
        where Spark ``arrays_overlap`` returns NULL. Both expand to
        CASE forms that re-evaluate the argument expressions (cheap
        scalar exprs; no CSE needed for correctness). list_intersect's
        asymmetric NULL (DuckDB: NULL second arg → [], NULL first →
        NULL) remains a documented deviation — Spark array_intersect
        is NULL-propagating both ways."""
        for regex, tmpl in (
            # the ELSE branches coalesce each arg with the OTHER one —
            # runtime no-op (ELSE only runs when both are non-NULL) that
            # gives Spark's analyzer a concrete array type when an arg is
            # an untyped NULL literal (bare NULL types as STRING otherwise)
            (
                self._LIST_CONCAT_RE,
                "(CASE WHEN ({a}) IS NULL THEN ({b}) "
                "WHEN ({b}) IS NULL THEN ({a}) "
                "ELSE concat(coalesce(({a}), ({b})), coalesce(({b}), ({a}))) END)",
            ),
            (
                self._LIST_HAS_ANY_RE,
                "(CASE WHEN ({a}) IS NULL OR ({b}) IS NULL THEN NULL "
                "ELSE coalesce(arrays_overlap(coalesce(({a}), ({b})), "
                "coalesce(({b}), ({a}))), false) END)",
            ),
        ):
            while True:
                hit = self._call_args(regex, sql)
                if not hit:
                    break
                m, close, args = hit
                if len(args) != 2:
                    raise UQueryError.sql_error(
                        "list_concat/list_has_any expect exactly 2 args"
                    )
                repl = tmpl.format(a=args[0], b=args[1])
                sql = sql[: m.start()] + repl + sql[close + 1 :]
        return sql

    # -- sweep batch 7: ORDER BY null placement, named-window extension,
    # window-frame EXCLUDE ------------------------------------------------

    _ORDER_BY_RE = re.compile(r"(?i)\border\s+by\b")
    _ORDER_STOP = {"rows", "range", "groups", "exclude", "limit", "offset",
                   "union", "intersect", "except", "window", "fetch",
                   "qualify", "having"}
    _KEY_TAIL_SKIP_RE = re.compile(r"(?i)(\bnulls\s+(first|last)|\bdesc)\s*$")

    def _rewrite_order_nulls(self, sql: str) -> str:
        """DuckDB's default null placement is NULLS LAST for BOTH sort
        directions; Spark's ASC default is NULLS FIRST — a silent
        result-changing divergence for window functions over nullable
        keys (first_value over ORDER BY x: DuckDB returns the smallest
        non-NULL x's row, Spark the NULL row — verified both engines)
        and for ORDER BY + LIMIT. Every ASC key without an explicit
        NULLS clause gets NULLS LAST appended, in every ORDER BY
        context (SELECT, OVER, WINDOW defs, WITHIN GROUP — all accept
        it, probed). DESC needs nothing (both default NULLS LAST).
        ``ORDER BY ALL`` is left untouched (Spark's ALL cannot take a
        NULLS clause)."""
        pos = 0
        while True:
            m = self._search_code(self._ORDER_BY_RE, sql, pos)
            if not m:
                return sql
            i, n, depth, end = m.end(), len(sql), 0, len(sql)
            bounds = []
            key_start = i
            while i < n:
                c = sql[i]
                if c == "'":
                    j = sql.find("'", i + 1)
                    i = n if j == -1 else j
                elif c == "(":
                    depth += 1
                elif c == ")":
                    if depth == 0:
                        end = i
                        break
                    depth -= 1
                elif c == "," and depth == 0:
                    bounds.append((key_start, i))
                    key_start = i + 1
                elif depth == 0 and (c.isalpha() or c == "_"):
                    j = i
                    while j < n and (sql[j].isalnum() or sql[j] == "_"):
                        j += 1
                    if sql[i:j].lower() in self._ORDER_STOP:
                        end = i
                        break
                    i = j - 1
                i += 1
            bounds.append((key_start, min(end, n)))
            segs = []
            for s0, s1 in bounds:
                seg = sql[s0:s1]
                st = seg.strip()
                if not st or st.lower() == "all" or self._KEY_TAIL_SKIP_RE.search(seg):
                    segs.append(seg)
                else:
                    cut = len(seg.rstrip())
                    segs.append(seg[:cut] + " NULLS LAST" + seg[cut:])
            new = sql[m.start() : m.end()] + ",".join(segs)
            sql = sql[: m.start()] + new + sql[end:]
            pos = m.start() + len(new)

    _WINDOW_DEF_RE = re.compile(r"(?i)\bwindow\s+(\w+)\s+as\s*\(")
    _WINDOW_DEF_MORE_RE = re.compile(r"(?i)^\s*,\s*(\w+)\s+as\s*\(")
    _OVER_NAMED_RE = re.compile(r"(?i)\bover\s*\(\s*(\w+)\b")

    def _rewrite_named_window_ext(self, sql: str) -> str:
        """DuckDB's named-window EXTENSION syntax ``OVER (w ORDER BY x)``
        — a named window plus extra clauses — is rejected by Spark
        (bare ``OVER w`` is fine). The named spec is inlined textually;
        the WINDOW clause itself stays (Spark supports it)."""
        defs: dict[str, str] = {}
        m = self._search_code(self._WINDOW_DEF_RE, sql)
        if m:
            name, open_i = m.group(1), sql.index("(", m.end() - 1)
            while True:
                close = self._find_close(sql, open_i)
                if close == -1:
                    break
                defs[name.lower()] = sql[open_i + 1 : close]
                more = self._WINDOW_DEF_MORE_RE.match(sql[close + 1 :])
                if not more:
                    break
                name, open_i = more.group(1), close + more.end()
        if not defs:
            return sql
        pos = 0
        while True:
            m = self._search_code(self._OVER_NAMED_RE, sql, pos)
            if not m:
                return sql
            name = m.group(1).lower()
            if name not in defs:
                pos = m.end()
                continue
            # inline: OVER (w <rest>) → OVER (<spec> <rest>)
            word_start = m.start(1)
            repl = defs[name]
            sql = sql[:word_start] + repl + sql[m.end(1) :]
            pos = word_start + len(repl)

    _WINDOW_FILTER_RE = re.compile(r"(?i)\)\s*filter\s*\(\s*where\b")
    _DISTINCT_AGG_RE = re.compile(r"(?i)\b(\w+)\s*\(\s*distinct\b")

    def _rewrite_distinct_over(self, sql: str) -> str:
        """Batch-15: DISTINCT aggregates over windows (running distinct
        counts — Spark rejects them) → expression trees over
        ``collect_set(x) OVER w`` (same NULL-skipping, frame semantics
        ride the window spec): count → size, sum → element-typed fold,
        avg → DOUBLE fold / size (try_divide: empty set → NULL like
        DuckDB), min/max → DISTINCT dropped (no-op). Other aggregates
        raise. The repeated collect_set is one physical window function
        (identical expressions dedupe)."""
        pos = 0
        while True:
            m = self._search_code(self._DISTINCT_AGG_RE, sql, pos)
            if not m:
                return sql
            open_i = sql.index("(", m.end(1))
            close = self._find_close(sql, open_i)
            if close == -1:
                return sql
            after = sql[close + 1 :]
            om = re.match(r"(?i)\s*over\s*", after)
            if not om:
                pos = open_i + 1  # plain DISTINCT aggregate — native
                continue
            rest = after[om.end() :]
            if rest.startswith("("):
                wclose = self._find_close(after, om.end())
                if wclose == -1:
                    return sql
                win = after[om.end() : wclose + 1]
                end = close + 1 + wclose + 1
            else:
                wm = re.match(r"\w+", rest)
                if not wm:
                    raise UQueryError.sql_error("OVER: expected window")
                win = wm.group(0)
                end = close + 1 + om.end() + wm.end()
            fn = m.group(1).lower()
            arg = re.sub(
                r"(?i)^\s*distinct\b", "", sql[open_i + 1 : close]
            ).strip()
            cs = f"collect_set({arg}) OVER {win}"
            if fn == "count":
                repl = f"CAST(size({cs}) AS BIGINT)"
            elif fn == "sum":
                repl = (
                    f"aggregate({cs}, try_element_at({cs}, 1) * 0, "
                    f"(uq_a, uq_x) -> uq_a + uq_x)"
                )
            elif fn in ("avg", "mean"):
                repl = (
                    f"try_divide(aggregate({cs}, "
                    f"CAST(try_element_at({cs}, 1) * 0 AS DOUBLE), "
                    f"(uq_a, uq_x) -> uq_a + uq_x), CAST(size({cs}) AS DOUBLE))"
                )
            elif fn in ("min", "max"):
                repl = f"{fn}({arg}) OVER {win}"
            else:
                raise UQueryError.sql_error(
                    f"DISTINCT {fn}() over a window is not supported "
                    "(count/sum/avg/min/max only)"
                )
            sql = sql[: m.start()] + repl + sql[end:]
            pos = m.start() + len(repl)

    def _rewrite_window_filter(self, sql: str) -> str:
        """Batch-13 sweep: aggregate ``FILTER`` over a WINDOW — DuckDB
        supports ``agg(x) FILTER (WHERE c) OVER (w)``, Spark rejects it
        → the filter folds into the argument: agg(CASE WHEN c THEN x
        END) (NULL rows don't aggregate), count(*) → count(CASE WHEN c
        THEN 1 END). Multi-arg aggregates raise. DISTINCT window
        aggregates are handled by _rewrite_distinct_over (batch 15),
        which runs first, so any DISTINCT reaching the FILTER fold
        here is the untranslatable combination and raises below. Plain
        (non-window) FILTER is native and untouched (the batch-9 pass
        already inserts the WHERE keyword)."""
        pos = 0
        while True:
            m = self._search_code(self._WINDOW_FILTER_RE, sql, pos)
            if not m:
                return sql
            fopen = sql.index("(", m.start() + 1)
            fclose = self._find_close(sql, fopen)
            if fclose == -1:
                return sql
            after = sql[fclose + 1 :].lstrip()
            if not re.match(r"(?i)over\b", after):
                # plain aggregate FILTER — native in Spark, skip it
                pos = fclose + 1
                continue
            cond = re.sub(r"(?i)^\s*where\b", "", sql[fopen + 1 : fclose]).strip()
            # the aggregate call directly before FILTER
            agg_text = sql[: m.start() + 1]  # includes its close paren
            aopen = self._asof_scan_balanced_back(agg_text, len(agg_text))
            fname_m = re.search(r"(\w+)\s*$", agg_text[:aopen])
            if not fname_m:
                raise UQueryError.sql_error("FILTER: expected agg(...) before it")
            fname = fname_m.group(1)
            arg = agg_text[aopen + 1 : -1].strip()
            if re.match(r"(?i)^distinct\b", arg):
                raise UQueryError.sql_error(
                    "FILTER with DISTINCT over a window is not supported"
                )
            args = self._split_top(arg, ",") if arg else []
            if arg == "*":
                new_call = f"{fname}(CASE WHEN {cond} THEN 1 END)"
            elif len(args) == 1:
                new_call = f"{fname}(CASE WHEN {cond} THEN ({arg}) END)"
            else:
                raise UQueryError.sql_error(
                    "windowed FILTER supports single-argument aggregates only"
                )
            sql = sql[: fname_m.start(1)] + new_call + sql[fclose + 1 :]
            pos = 0  # text changed — rescan from the top

    _FRAME_EXCLUDE_RE = re.compile(
        r"(?i)\bexclude\s+(current\s+row|group|ties|no\s+others)\b"
    )

    @staticmethod
    def _frame_excludes_current(spec: str) -> bool:
        """True when the frame clause provably does not contain the
        current row — end bound ``<x> PRECEDING`` or start bound
        ``<x> FOLLOWING`` for ANY offset token (integer, decimal,
        INTERVAL, expression). The subtraction translations for
        EXCLUDE are only sound on frames containing the current row.
        r9 ADVICE fix: the old guard matched bare-integer offsets
        only, so ``RANGE BETWEEN 10.0 PRECEDING AND 0.5 PRECEDING``
        or interval-offset frames bypassed it and got silently wrong
        peer-group subtractions (differentially verified)."""
        fm = re.search(
            r"(?i)\b(rows|range|groups)\s+between\s+(.*)$", spec, re.S
        )
        if not fm:
            # single-bound frames (`ROWS <x> PRECEDING`) run to
            # CURRENT ROW — they always contain it
            return False
        body = fm.group(2).strip()
        # end bound `<x> PRECEDING`: the frame clause is the tail of
        # the OVER spec, so a trailing PRECEDING is the end bound
        # (UNBOUNDED PRECEDING is not a legal end bound)
        if re.search(r"(?i)\bpreceding\s*$", body):
            return True
        # start bound `<x> FOLLOWING`: the first bound ends at the
        # top-level AND — CURRENT ROW / UNBOUNDED PRECEDING starts
        # never contain the token pair `FOLLOWING AND`
        if re.search(r"(?i)\bfollowing\s+and\b", body):
            return True
        return False

    def _rewrite_window_exclude(self, sql: str) -> str:
        """Window-frame EXCLUDE (DuckDB/SQL:2011; Spark has none):
        ``EXCLUDE NO OTHERS`` is the default — stripped. ``EXCLUDE
        CURRENT ROW`` for sum/count/avg becomes frame-aggregate MINUS
        the current row's contribution (count guard reproduces DuckDB's
        NULL on an empty exclusion frame — verified). ``EXCLUDE GROUP``
        / ``EXCLUDE TIES`` (round 8) subtract the peer group's
        contribution via a second window partitioned by (partition
        keys + ORDER BY exprs), TIES adding the current row back —
        RANGE/default frames only (peers sit at RANGE distance 0, so
        they're provably inside any frame containing the current row;
        a ROWS frame may cut the group → raise). Non-invertible
        aggregates raise (translate-or-raise)."""
        while True:
            m = self._search_code(self._FRAME_EXCLUDE_RE, sql)
            if not m:
                return sql
            mode = re.sub(r"\s+", " ", m.group(1).lower())
            if mode == "no others":
                sql = sql[: m.start()].rstrip() + sql[m.end() :]
                continue
            # CURRENT ROW / GROUP / TIES: locate enclosing OVER ( … )
            # and the preceding aggregate
            depth, i = 0, m.start() - 1
            open_idx = -1
            while i >= 0:
                c = sql[i]
                if c == ")":
                    depth += 1
                elif c == "(":
                    if depth == 0:
                        open_idx = i
                        break
                    depth -= 1
                i -= 1
            pre = sql[:open_idx].rstrip() if open_idx > 0 else ""
            if open_idx < 0 or not pre.lower().endswith("over"):
                raise UQueryError.sql_error(
                    "EXCLUDE CURRENT ROW: only inline OVER (...) frames are "
                    "supported (not WINDOW definitions)"
                )
            over_close = self._find_close(sql, open_idx)
            if over_close == -1:
                raise UQueryError.sql_error("EXCLUDE: unbalanced OVER frame")
            spec = (
                sql[open_idx + 1 : m.start()] + sql[m.end() : over_close]
            ).strip()
            if self._frame_excludes_current(spec):
                raise UQueryError.sql_error(
                    f"EXCLUDE {mode.upper()}: frame does not contain the "
                    "current row"
                )
            # the aggregate call directly before OVER
            agg_end = len(pre) - len("over")
            agg_text = pre[:agg_end].rstrip()
            if not agg_text.endswith(")"):
                raise UQueryError.sql_error("EXCLUDE: expected agg(...) OVER")
            aopen = self._asof_scan_balanced_back(agg_text, len(agg_text))
            fname_m = re.search(r"(\w+)\s*$", agg_text[:aopen])
            if not fname_m:
                raise UQueryError.sql_error("EXCLUDE: expected agg(...) OVER")
            fname = fname_m.group(1).lower()
            arg = agg_text[aopen + 1 : -1].strip()
            agg_start = fname_m.start(1)
            if re.match(r"(?i)^\s*distinct\b", arg):
                raise UQueryError.sql_error(
                    f"EXCLUDE {mode.upper()} with DISTINCT is not supported"
                )
            if fname not in ("count", "sum", "avg"):
                raise UQueryError.sql_error(
                    f"EXCLUDE {mode.upper()}: unsupported aggregate "
                    f"'{fname}' (only sum/count/avg are invertible)"
                )
            if mode == "current row":
                if fname == "count" and arg == "*":
                    repl = f"(count(*) OVER ({spec}) - 1)"
                else:
                    nn = f"(CASE WHEN ({arg}) IS NULL THEN 0 ELSE 1 END)"
                    cnt = f"(count({arg}) OVER ({spec}) - {nn})"
                    if fname == "count":
                        repl = cnt
                    elif fname == "sum":
                        repl = (
                            f"(CASE WHEN {cnt} = 0 THEN NULL "
                            f"ELSE sum({arg}) OVER ({spec}) - coalesce(({arg}), 0) END)"
                        )
                    else:
                        repl = (
                            f"(CASE WHEN {cnt} = 0 THEN NULL "
                            f"ELSE (sum({arg}) OVER ({spec}) - coalesce(({arg}), 0)) "
                            f"/ {cnt} END)"
                        )
            else:
                # GROUP / TIES (round 8, invertible aggs): subtract the
                # PEER GROUP's contribution — computed over a second
                # window partitioned by (partition keys + ORDER BY
                # value exprs), i.e. exactly the current row's peers —
                # and for TIES add the current row back. Sound only
                # when the whole peer group is inside the frame: peers
                # sit at RANGE distance 0, so any RANGE/default frame
                # containing the current row qualifies; explicit
                # ROWS/GROUPS frames raise (a peer may be outside).
                if re.search(
                    r"(?i)\b(rows|groups)\s+(between|unbounded|current|\d)",
                    spec,
                ):
                    raise UQueryError.sql_error(
                        f"EXCLUDE {mode.upper()}: only RANGE/default "
                        "frames are supported (a ROWS frame may cut the "
                        "peer group)"
                    )
                frame_m = re.search(
                    r"(?i)\brange\s+(between|unbounded|current|\d)", spec
                )
                cut = frame_m.start() if frame_m else len(spec)
                pm = re.search(r"(?i)\bpartition\s+by\s+", spec)
                om = re.search(r"(?i)\border\s+by\s+", spec)
                pk_txt = (
                    spec[pm.end() : om.start() if om else cut].strip()
                    if pm
                    else ""
                )
                ob_txt = spec[om.end() : cut].strip() if om else ""
                keys = []
                for k in self._split_top(ob_txt, ",") if ob_txt else []:
                    k = re.sub(r"(?i)\s+nulls\s+(first|last)\s*$", "", k.strip())
                    k = re.sub(r"(?i)\s+(asc|desc)\s*$", "", k).strip()
                    if k:
                        keys.append(k)
                parts = (
                    [p.strip() for p in self._split_top(pk_txt, ",")]
                    if pk_txt
                    else []
                ) + keys
                gspec = ("PARTITION BY " + ", ".join(parts)) if parts else ""
                keep = mode == "ties"
                if fname == "count" and arg == "*":
                    repl = (
                        f"(count(*) OVER ({spec}) - count(*) OVER ({gspec})"
                        + (" + 1)" if keep else ")")
                    )
                else:
                    nn = f"(CASE WHEN ({arg}) IS NULL THEN 0 ELSE 1 END)"
                    cnt = (
                        f"(count({arg}) OVER ({spec}) - "
                        f"count({arg}) OVER ({gspec})"
                        + (f" + {nn})" if keep else ")")
                    )
                    if fname == "count":
                        repl = cnt
                    else:
                        s = (
                            f"(sum({arg}) OVER ({spec}) - "
                            f"coalesce(sum({arg}) OVER ({gspec}), 0)"
                            + (f" + coalesce(({arg}), 0))" if keep else ")")
                        )
                        if fname == "sum":
                            repl = f"(CASE WHEN {cnt} = 0 THEN NULL ELSE {s} END)"
                        else:
                            repl = (
                                f"(CASE WHEN {cnt} = 0 THEN NULL "
                                f"ELSE {s} / {cnt} END)"
                            )
            sql = sql[:agg_start] + repl + sql[over_close + 1 :]

    def _rewrite_divide_xor(self, sql: str) -> str:
        """DuckDB operator-alias functions → infix operators.

        divide(a, b) IS `//`, which is TRUNCATING integer division only
        when BOTH operands are integral (divide(7,2)=3, divide(-7,2)=-3)
        and PLAIN division returning DOUBLE otherwise (divide(7.5,2)=
        3.75; DECIMAL operands probe DOUBLE too) — the old blanket `div`
        was a silent wrong-value class on fractional operands (wave-4
        gap probe, round 10). Emitted as uq_poly(double-arm, int-arm):
        the int arm analyzes only when ``(a & 0) + (b & 0)`` does (ANSI
        `&` rejects fractional operands, accepts integral/string — the
        _rewrite_cast probe trick). Divisors are nullif-wrapped HERE:
        the word operator `div` is invisible to the ÷0 pass's /|%|//
        character scan, so divide(7, 0) previously raised ANSI
        DIVIDE_BY_ZERO where DuckDB returns NULL.

        add/subtract/multiply/mod are the remaining alias functions →
        (a + b), (a - b), (a * b), (a % nullif(b, 0)); the emitted infix
        text flows through the later date/interval widening passes, so
        subtract(DATE, n) keeps date semantics. xor(a, b) → bitwise ^.
        """
        div_tmpl = (
            "uq_poly("
            "(({a}) / nullif(CAST(({b}) AS DOUBLE), 0)), "
            "(((({a}) & 0) + (({b}) & 0)) + (({a}) div nullif(({b}), 0))))"
        )
        for regex, tmpl in (
            (self._DIVIDE_RE, div_tmpl),
            (self._XOR_RE, "(({a}) ^ ({b}))"),
            (self._ADD_RE, "(({a}) + ({b}))"),
            (self._SUBTRACT_RE, "(({a}) - ({b}))"),
            (self._MULTIPLY_RE, "(({a}) * ({b}))"),
            (self._MOD_FN_RE, "(({a}) % nullif(({b}), 0))"),
        ):
            while True:
                hit = self._call_args(regex, sql)
                if not hit:
                    break
                m, close, args = hit
                if len(args) != 2:
                    raise UQueryError.sql_error(
                        f"{m.group(0).rstrip('( ').strip()} expects exactly 2 args"
                    )
                repl = tmpl.format(a=args[0], b=args[1])
                sql = sql[: m.start()] + repl + sql[close + 1 :]
        return sql

    # -- ASOF JOIN SQL form ------------------------------------------------

    _ASOF_KW_RE = re.compile(r"(?i)\basof\s+(?P<left>left\s+)?join\b")
    _ASOF_CMP_RE = re.compile(
        r"^\s*(?P<a>[\w.]+)\s*(?P<op>>=|<=|=|<|>)\s*(?P<b>[\w.]+)\s*$"
    )
    _ASOF_STOP = {"where", "group", "order", "limit", "qualify", "union",
                  "intersect", "except", "join", "inner", "left", "right",
                  "full", "cross", "window", "having", "asof"}

    @staticmethod
    def _asof_scan_balanced(sql: str, i: int) -> int:
        """``sql[i] == '('`` → index just past the matching ')'."""
        depth = 0
        n = len(sql)
        while i < n:
            c = sql[i]
            if c == "'":
                j = sql.find("'", i + 1)
                i = n if j == -1 else j
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    return i + 1
            i += 1
        raise UQueryError.sql_error("ASOF JOIN: unbalanced '(' in relation")

    @staticmethod
    def _asof_scan_balanced_back(sql: str, end: int) -> int:
        """``sql[end-1] == ')'`` → index of the matching '('. Scans
        backward; single-quoted literals are skipped (their quotes pair
        up, so counting both quotes of a literal keeps parity)."""
        depth, i = 0, end - 1
        in_lit = False
        while i >= 0:
            c = sql[i]
            if c == "'":
                in_lit = not in_lit
            elif not in_lit:
                if c == ")":
                    depth += 1
                elif c == "(":
                    depth -= 1
                    if depth == 0:
                        return i
            i -= 1
        raise UQueryError.sql_error("ASOF JOIN: unbalanced ')' before ASOF")

    def _asof_parse_right(self, sql: str, pos: int):
        """Parse the relation after ``ASOF JOIN`` → (rel_sql, alias|None,
        end, kind) where kind is 'on'|'using' for the keyword found."""
        n = len(sql)
        i = pos
        while i < n and sql[i].isspace():
            i += 1
        if i < n and sql[i] == "(":
            j = self._asof_scan_balanced(sql, i)
            rel = sql[i:j]
        else:
            mrel = re.match(r"[\w.]+", sql[i:])
            if not mrel:
                raise UQueryError.sql_error("ASOF JOIN: missing right relation")
            j = i + mrel.end()
            rel = mrel.group(0)
        alias = None
        mtail = re.match(r"\s+(?:as\s+)?(\w+)", sql[j:], re.I)
        while mtail:
            word = mtail.group(1)
            if word.lower() in ("on", "using"):
                break
            alias = word
            j += mtail.end()
            mtail = re.match(r"\s+(?:as\s+)?(\w+)", sql[j:], re.I)
        mkw = re.match(r"\s+(on|using)\b", sql[j:], re.I)
        if not mkw:
            raise UQueryError.sql_error("ASOF JOIN: expected ON or USING")
        return rel, alias, j + mkw.end(), mkw.group(1).lower()

    def _asof_parse_left(self, sql: str, end: int):
        """Parse the relation before ``ASOF`` (scanning backward) →
        (rel_sql, alias|None, start). The relation must follow a
        top-level FROM / JOIN / ','."""

        def read_word(i: int) -> tuple[str, int]:
            j = i
            while j > 0 and (sql[j - 1].isalnum() or sql[j - 1] in "_."):
                j -= 1
            return sql[j:i], j

        def skip_ws(i: int) -> int:
            while i > 0 and sql[i - 1].isspace():
                i -= 1
            return i

        def check_pre(i: int) -> None:
            k = skip_ws(i)
            if k > 0 and sql[k - 1] == ",":
                return
            w, _ = read_word(k)
            if w.lower() not in ("from", "join"):
                raise UQueryError.sql_error(
                    "ASOF JOIN: left relation must follow FROM/JOIN/','"
                )

        i = skip_ws(end)
        if i > 0 and sql[i - 1] == ")":
            start = self._asof_scan_balanced_back(sql, i)
            check_pre(start)
            return sql[start:i], None, start
        word, j = read_word(i)
        if not word:
            raise UQueryError.sql_error("ASOF JOIN: missing left relation")
        k = skip_ws(j)
        if k > 0 and sql[k - 1] == ")":
            # word is the alias of a parenthesised subquery
            start = self._asof_scan_balanced_back(sql, k)
            check_pre(start)
            return sql[start:k], word, start
        word2, j2 = read_word(k)
        if word2.lower() == "as":
            k2 = skip_ws(j2)
            if k2 > 0 and sql[k2 - 1] == ")":
                start = self._asof_scan_balanced_back(sql, k2)
                check_pre(start)
                return sql[start:k2], word, start
            word3, j3 = read_word(k2)
            check_pre(j3)
            return word3, word, j3
        if not word2 or word2.lower() in ("from", "join"):
            # bare relation: `FROM t ASOF JOIN …`
            return word, None, j
        k2 = skip_ws(j2)
        if k2 > 0 and sql[k2 - 1] == ",":
            return word, None, j
        # `FROM t alias ASOF JOIN …`
        check_pre(j2)
        return word2, word, j2

    def _rewrite_asof_join(self, sql: str) -> str:
        """DuckDB ``l ASOF [LEFT] JOIN r ON <eq…> AND l.on >= r.on`` (or
        ``… USING (k…, on)`` — last USING column is the ``>=`` ordering,
        DuckDB docs "AsOf Joins") → the union + windowed last/first-
        non-null derived table (the same single-sort-shuffle plan as
        operators/asof.py, incl. the struct-per-right-row matching so a
        NULL payload on the matched row stays NULL). All four inequality
        directions; strictness handled by tie-ordering. Relations may be
        named tables/views or parenthesised subqueries (path tables are
        views by this point).

        NULL semantics (ADVICE r5): a right row whose ordering key or any
        equality key is NULL is filtered out of the right branch (NULL
        compares match nothing), and a left row with a NULL ordering key
        gets a NULL match — both verified against DuckDB. (DuckDB 1.0.0's
        KEYED path matches NULL-to-NULL ordering keys backward; its own
        unkeyed path does not — we follow the strict comparison
        semantics both ways.)

        Output naming: left columns keep their names; right columns that
        collide get a ``_1`` suffix (DuckDB's duplicate-disambiguation
        shape), so every column is referenceable downstream by BARE name
        — the derived table is aliased ``uq_asof`` and the original
        relation aliases go out of scope, like any derived table. For
        USING, the join columns are emitted once (left copy, DuckDB
        star shape)."""
        m = self._search_code(self._ASOF_KW_RE, sql)
        if not m:
            return sql
        lrel, lal_in, start = self._asof_parse_left(sql, m.start())
        rrel, ral_in, cond_start, kw = self._asof_parse_right(sql, m.end())
        inner = not m.group("left")
        lsub = lrel.startswith("(")
        rsub = rrel.startswith("(")
        lal = lal_in or ("__uq_l" if lsub or "." in lrel else lrel)
        ral = ral_in or ("__uq_r" if rsub or "." in rrel else rrel)
        try:
            lp = self._rewrite_poly_subscript(lrel)
            rp = self._rewrite_poly_subscript(rrel)
            lcols = self.spark.sql(f"SELECT * FROM {lp} LIMIT 0").columns
            rcols = self.spark.sql(f"SELECT * FROM {rp} LIMIT 0").columns
        except Exception as exc:
            raise UQueryError.sql_error(
                f"ASOF JOIN: cannot resolve relation schema: {exc}"
            ) from exc

        def side_of(ref: str) -> tuple[str, str]:
            """→ ('l'|'r', bare column name)."""
            if "." in ref:
                pre, col = ref.rsplit(".", 1)
                if pre.lower() in (lal.lower(), lrel.lower()):
                    return "l", col
                if pre.lower() in (ral.lower(), rrel.lower()):
                    return "r", col
                raise UQueryError.sql_error(f"ASOF JOIN: unknown qualifier '{pre}'")
            inl, inr = ref in lcols, ref in rcols
            if inl and not inr:
                return "l", ref
            if inr and not inl:
                return "r", ref
            raise UQueryError.sql_error(
                f"ASOF JOIN: ambiguous or unknown column '{ref}' — qualify it"
            )

        keys: list[tuple[str, str]] = []
        on_pair = None  # (lcol, rcol, op_normalized_to_l_side)
        using_cols: list[str] = []
        if kw == "using":
            i = cond_start
            while i < len(sql) and sql[i].isspace():
                i += 1
            if i >= len(sql) or sql[i] != "(":
                raise UQueryError.sql_error("ASOF JOIN USING: expected '(col, …)'")
            close = self._asof_scan_balanced(sql, i)
            using_cols = [c.strip() for c in sql[i + 1 : close - 1].split(",")]
            if not using_cols or not all(
                re.fullmatch(r"\w+", c) for c in using_cols
            ):
                raise UQueryError.sql_error(
                    "ASOF JOIN USING: bare column names only"
                )
            for c in using_cols:
                if c not in lcols or c not in rcols:
                    raise UQueryError.sql_error(
                        f"ASOF JOIN USING: column '{c}' must exist on both sides"
                    )
            # DuckDB: the LAST USING column is the >= ordering key
            keys = [(c, c) for c in using_cols[:-1]]
            on_pair = (using_cols[-1], using_cols[-1], ">=")
            cond_end = close
        else:
            cond_end = len(sql)
            for s, _e, _w in self._scan_top_level(sql, self._ASOF_STOP, cond_start):
                cond_end = s
                break
            depth = 0
            for i in range(cond_start, cond_end):
                c = sql[i]
                if c == "(":
                    depth += 1
                elif c == ")":
                    if depth == 0:
                        cond_end = i
                        break
                    depth -= 1
            cond = sql[cond_start:cond_end].strip()
            for conj in self._split_top(cond, "AND"):
                cm = self._ASOF_CMP_RE.match(conj)
                if not cm:
                    raise UQueryError.sql_error(
                        f"ASOF JOIN: unsupported condition '{conj.strip()[:60]}'"
                    )
                sa, ca = side_of(cm.group("a"))
                sb, cb = side_of(cm.group("b"))
                op = cm.group("op")
                if sa == sb:
                    raise UQueryError.sql_error(
                        "ASOF JOIN: each condition must compare the two sides"
                    )
                if sa == "r":  # normalize to left operand first
                    sa, sb, ca, cb = sb, sa, cb, ca
                    op = {">": "<", "<": ">", ">=": "<=", "<=": ">="}.get(op, op)
                if op == "=":
                    keys.append((ca, cb))
                elif on_pair is None:
                    on_pair = (ca, cb, op)
                else:
                    raise UQueryError.sql_error(
                        "ASOF JOIN: exactly one inequality required"
                    )
            if on_pair is None:
                raise UQueryError.sql_error(
                    "ASOF JOIN: an inequality condition is required"
                )
        lon, ron, op = on_pair
        backward = op in (">=", ">")
        inclusive = op in (">=", "<=")
        # tie order: whether the coincident RIGHT row is visible to the
        # left row's frame
        if backward:
            l_ord, r_ord = (1, 0) if inclusive else (0, 1)
            win = ("last", "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW")
        else:
            l_ord, r_ord = (0, 1) if inclusive else (1, 0)
            win = ("first", "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING")

        l_sel = ", ".join(
            [f"{lal}.`{c}` AS __l{i}" for i, c in enumerate(lcols)]
            + [f"NULL AS __r{j}" for j in range(len(rcols))]
            + [f"{lal}.`{k}` AS __k{n}" for n, (k, _) in enumerate(keys)]
            + [f"{lal}.`{lon}` AS __on", "1 AS __tag", f"{l_ord} AS __ord"]
        )
        r_sel = ", ".join(
            [f"NULL AS __l{i}" for i in range(len(lcols))]
            + [f"{ral}.`{c}` AS __r{j}" for j, c in enumerate(rcols)]
            + [f"{ral}.`{rk}` AS __k{n}" for n, (_, rk) in enumerate(keys)]
            + [f"{ral}.`{ron}` AS __on", "0 AS __tag", f"{r_ord} AS __ord"]
        )
        # NULL compares match nothing: right rows with a NULL ordering key
        # or a NULL equality key can never be the match — drop them before
        # the union so the window can't pick them (ADVICE r5).
        r_where = " AND ".join(
            [f"{ral}.`{ron}` IS NOT NULL"]
            + [f"{ral}.`{rk}` IS NOT NULL" for _, rk in keys]
        )
        match = (
            "CASE WHEN __tag = 0 THEN named_struct("
            + ", ".join(f"'r{j}', __r{j}" for j in range(len(rcols)))
            + ") END"
        )
        part = ", ".join(f"__k{n}" for n in range(len(keys))) or "1"
        w = (
            f"{win[0]}({match}) IGNORE NULLS OVER (PARTITION BY {part} "
            f"ORDER BY __on ASC, __ord ASC {win[1]})"
        )
        # a LEFT row with a NULL ordering key never matches either
        w = f"IF(__on IS NULL, NULL, {w})"
        if kw == "using":
            r_emit = [(j, c) for j, c in enumerate(rcols) if c not in set(using_cols)]
        else:
            r_emit = list(enumerate(rcols))
        used = set(lcols)
        r_named: list[tuple[int, str]] = []
        for j, c in r_emit:
            name, k = c, 1
            while name in used:
                name, k = f"{c}_{k}", k + 1
            used.add(name)
            r_named.append((j, name))
        out = ", ".join(
            [f"__l{i} AS `{c}`" for i, c in enumerate(lcols)]
            + [f"__m.r{j} AS `{name}`" for j, name in r_named]
        )
        guard = " AND __m IS NOT NULL" if inner else ""
        gen = (
            f"(SELECT {out} FROM ("
            f"SELECT u.*, {w} AS __m FROM ("
            f"SELECT {l_sel} FROM {lrel} {lal} UNION ALL "
            f"SELECT {r_sel} FROM {rrel} {ral} WHERE {r_where}"
            f") u) WHERE __tag = 1{guard}) uq_asof"
        )
        return self._rewrite_asof_join(sql[:start] + gen + " " + sql[cond_end:])

    # -- sweep batch 3: SIMILAR TO / GLOB operators, trailing comma -------

    _SIMILAR_TO_RE = re.compile(r"(?i)\b(not\s+)?similar\s+to\s+'((?:[^']|'')*)'")
    _GLOB_RE = re.compile(r"(?i)\bglob\s+'((?:[^']|'')*)'")
    _TRAILING_COMMA_RE = re.compile(r",(\s+from\b)", re.IGNORECASE)

    def _rewrite_similar_glob(self, sql: str) -> str:
        """``x [NOT] SIMILAR TO 'p'`` → anchored ``[NOT] RLIKE
        '^(?:p)$'`` (SIMILAR TO is a fully-anchored regex in DuckDB);
        ``x GLOB 'pat'`` → LIKE with * → % and ? → _ (existing LIKE
        metachars escaped; bracket classes raise — LIKE can't express
        them). Only the operator + literal is replaced, so the left
        operand needs no parsing."""

        def similar(m: re.Match) -> str:
            neg = "NOT " if m.group(1) else ""
            return f"{neg}RLIKE '^(?:{m.group(2)})$'"

        def glob_regex(pat: str) -> str | None:
            """GLOB with bracket classes (batch 28, pattern fuzzer) →
            anchored regex. DuckDB-probed: only '!' negates ('^' is a
            literal member), ']' as first member is literal, an
            UNCLOSED '[' never matches anything (→ '(?!)'); a bare
            leading/trailing '-' raises (DuckDB's own never-match edge
            — loud beats replicating an accident)."""
            out, i, n = [], 0, len(pat)
            while i < n:
                c = pat[i]
                if c == "*":
                    out.append(".*")
                elif c == "?":
                    out.append(".")
                elif c == "[":
                    j = i + 1
                    neg = j < n and pat[j] == "!"
                    if neg:
                        j += 1
                    start = j
                    if j < n and pat[j] == "]":
                        j += 1  # literal ] first member
                    while j < n and pat[j] != "]":
                        j += 1
                    if j >= n:
                        return None  # unclosed: never matches
                    body = pat[start:j]
                    cls = []
                    for k, ch in enumerate(body):
                        if ch == "-":
                            if 0 < k < len(body) - 1:
                                cls.append("-")
                                continue
                            raise UQueryError.sql_error(
                                "GLOB: bare '-' at a bracket-class edge "
                                "(DuckDB's never-match edge — write the "
                                "range out)"
                            )
                        cls.append("\\" + ch if ch in "\\^]['&" else ch)
                    out.append(("[^" if neg else "[") + "".join(cls) + "]")
                    i = j + 1
                    continue
                elif c in ".^$+{}()|\\]":
                    out.append("\\" + c)
                else:
                    out.append(c)
                i += 1
            return "^(?:" + "".join(out) + ")$"

        def glob(m: re.Match) -> str:
            pat = m.group(1)
            if "[" in pat:
                rx = glob_regex(pat)
                if rx is None:
                    rx = "(?!)"  # unclosed '[': DuckDB matches nothing
                # emitted literal must be in Spark escape space
                return "RLIKE '" + rx.replace("\\", "\\\\") + "'"
            like = (
                pat.replace("\\", "\\\\")
                .replace("%", "\\%")
                .replace("_", "\\_")
                .replace("*", "%")
                .replace("?", "_")
            )
            return f"LIKE '{like}'"

        out, pos = [], 0
        while True:
            ms = self._search_code(self._SIMILAR_TO_RE, sql, pos)
            mg = self._search_code(self._GLOB_RE, sql, pos)
            m = min((x for x in (ms, mg) if x), key=lambda x: x.start(), default=None)
            if m is None:
                out.append(sql[pos:])
                return "".join(out)
            out.append(sql[pos : m.start()])
            out.append(similar(m) if m.re is self._SIMILAR_TO_RE else glob(m))
            pos = m.end()

    def _strip_trailing_select_comma(self, sql: str) -> str:
        """DuckDB tolerates ``SELECT a, b, FROM t``; Spark raises
        TRAILING_COMMA_IN_SELECT. A comma DIRECTLY preceding FROM is
        never legal SQL otherwise, so stripping it code-wide is safe."""
        m = self._search_code(self._TRAILING_COMMA_RE, sql)
        while m:
            sql = sql[: m.start()] + m.group(1) + sql[m.end() :]
            m = self._search_code(self._TRAILING_COMMA_RE, sql)
        return sql

    # -- DuckDB bracket syntax: literals, indexing, slicing, comprehensions

    @staticmethod
    def _find_close(s: str, i: int) -> int:
        """Index of the ']'/')' matching the opener at s[i]; -1 if none.
        Skips string literals; tracks both bracket kinds."""
        depth = 0
        n = len(s)
        while i < n:
            c = s[i]
            if c == "'":
                j = s.find("'", i + 1)
                i = n if j == -1 else j
            elif c in "([":
                depth += 1
            elif c in ")]":
                depth -= 1
                if depth == 0:
                    return i
            i += 1
        return -1

    @staticmethod
    def _split_top(s: str, sep: str) -> list[str]:
        """Split on a top-level (outside strings/brackets) separator.
        Word separators (alpha) match case-insensitively with word
        boundaries; ':' matches bare."""
        parts, depth, start, i, n = [], 0, 0, 0, len(s)
        word = sep.strip().isalpha()
        while i < n:
            c = s[i]
            if c == "'":
                j = s.find("'", i + 1)
                i = n if j == -1 else j
            elif c in "([":
                depth += 1
            elif c in ")]":
                depth -= 1
            elif depth == 0:
                if word:
                    m = re.match(rf"(?i)\b{sep}\b", s[i:])
                    if m and (i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_")):
                        parts.append(s[start:i])
                        start = i + m.end()
                        i = start
                        continue
                elif c == sep:
                    parts.append(s[start:i])
                    start = i + 1
            i += 1
        parts.append(s[start:])
        return parts

    @staticmethod
    def _take_operand(head: str) -> tuple[str, str]:
        """Split accumulated text into (prefix, trailing-operand) where the
        operand is the expression a postfix [..] applies to: a dotted
        identifier chain, or a ')'/']'-terminated group (scanned back
        balanced)."""
        i = len(head)
        while i > 0:
            c = head[i - 1]
            if c in ")]":
                target = {"]": "[", ")": "("}[c]
                depth = 0
                j = i
                while j > 0:
                    cj = head[j - 1]
                    if cj in ")]":
                        depth += 1
                    elif cj in "([":
                        depth -= 1
                        if depth == 0:
                            break
                    j -= 1
                i = j - 1 if j > 0 else 0
                # a preceding function name binds to the parens
                while i > 0 and (head[i - 1].isalnum() or head[i - 1] in "_."):
                    i -= 1
                continue
            if c.isalnum() or c in "_.":
                i -= 1
                continue
            if c == "'":
                # string-literal operand ('abc'[2]): scan to the opening
                # quote (escaped '' pairs re-enter the literal)
                j = head.rfind("'", 0, i - 1)
                if j < 0:
                    break
                i = j
                continue
            break
        return head[:i], head[i:]

    @staticmethod
    def _slice_form(operand: str, a: str, b: str, slice_fn: str, size_fn: str) -> str:
        """The normalized DuckDB slice (1-based inclusive, negative from
        the end, clamped; inverted → empty) over either container kind:
        (slice, size) for lists, (substring, length) for strings —
        identical window arithmetic, verified on both engines."""
        neg = lambda x: re.fullmatch(r"-\d+", x)  # noqa: E731
        if not b:
            if neg(a):
                return f"{slice_fn}({operand}, {a}, {a.lstrip('-')})"
            start = a or "1"
            return f"{slice_fn}({operand}, {start}, {size_fn}({operand}))"
        b_ix = f"{size_fn}({operand}) + ({b}) + 1" if neg(b) else b
        a_ix = f"{size_fn}({operand}) + ({a}) + 1" if neg(a) else (a or "1")
        start = a_ix if re.fullmatch(r"[1-9]\d*", a_ix) else f"greatest(1, {a_ix})"
        return f"{slice_fn}({operand}, {start}, greatest(0, ({b_ix}) - ({start}) + 1))"

    def _bracket_postfix(self, operand: str, inner: str) -> str:
        """1-based DuckDB indexing/slicing on `operand` → Spark calls.

        index: l[i] → get(l, i-1) (i=0 and out-of-range give NULL);
        negative literal → try_element_at (counts from the end).
        slice (1-based INCLUSIVE bounds): l[a:b] → slice(l, a, b-a+1);
        open ends use 1 / size(l); negative a with open end keeps the
        tail (slice(l, -k, k)).

        The operand's type is unknowable at rewrite time, and DuckDB
        subscripts also apply to STRINGS ('abcdef'[2:4] = 'bcd', [i] =
        one character, OOB/0 → '') with the SAME window arithmetic —
        so list and string translations are BOTH emitted inside a
        ``uq_poly(list_form, string_form)`` marker that
        _rewrite_poly_subscript resolves with a LIMIT-0 type probe at
        the end of the pipeline. The string index form is emitted as a
        DuckDB-semantics 3-arg substring and picked up by the batch-8
        window translation downstream.
        """
        colon_parts = self._split_top(inner, ":")
        if len(colon_parts) == 3:
            # batch-19: STEP slices — l[a:b:s] takes every s-th element
            # of the inclusive window; a negative step walks b..a
            # REVERSED ([5:1:-2] = [5,3,1], [::-1] = full reverse);
            # step 0 errors like DuckDB. The old 2-part parse silently
            # DROPPED the step (sweep find). Lists only — DuckDB itself
            # raises "not implemented" for strings with steps.
            a, b, s = (p.strip() for p in colon_parts)
            if not re.fullmatch(r"-?\d+", s):
                raise UQueryError.sql_error(
                    "slice step must be a literal integer"
                )
            step = int(s)
            if step == 0:
                raise UQueryError.sql_error("Slice step cannot be zero")
            if step > 0:
                base = self._slice_form(operand, a, b, "slice", "size")
            else:
                # uq_native_reverse: a sentinel the batch-28 grapheme
                # pass must NOT intercept (lists reverse natively);
                # restored to reverse() at the end of the pipeline
                base = f"uq_native_reverse({self._slice_form(operand, b, a, 'slice', 'size')})"
                step = -step
            if step == 1:
                return base
            # stride via an index sequence + 1-arg lambda: a 2-arg
            # filter lambda here would get the batch-7 1-based index
            # shift downstream (this text predates that pass)
            return (
                f"(CASE WHEN size({base}) = 0 THEN {base} "
                f"ELSE transform(sequence(1, size({base}), {step}), "
                f"uq_ix -> element_at({base}, uq_ix)) END)"
            )
        if len(colon_parts) > 1:
            a, b = (p.strip() for p in colon_parts[:2])
            if not a and not b:
                return operand
            lst = self._slice_form(operand, a, b, "slice", "size")
            st = self._slice_form(operand, a, b, "substring", "length")
            return f"uq_poly({lst}, {st})"
        idx = inner.strip()
        if operand.lower().startswith("map("):
            # subscript directly on a MAP {} literal: key lookup whatever
            # the key type. DuckDB map[k] returns a single-element LIST
            # ([] when the key is missing) — matched with a filtered
            # one-element array, so chained [1] unwrapping works on the
            # identical SQL both engines run.
            return (
                f"filter(array(try_element_at({operand}, {idx})), uq_mv -> uq_mv IS NOT NULL)"
            )
        if idx.startswith("'"):  # string key ⇒ map/struct access
            # batch 25: map-vs-struct resolves by LIMIT-0 probe
            # (uq_polymap marker): MAP subscripts return DuckDB's
            # single-element LIST ([] when missing), STRUCT subscripts
            # return the field. Fallback: scalar element_at (the
            # pre-batch-25 behavior).
            return f"uq_polymap({operand}, {idx})"
        # batch 28: integer subscripts are also MAP key access in DuckDB
        # (m[1] → single-element LIST) — the uq_polymapi marker probes
        # map-ness first (map_keys discriminator) and otherwise falls
        # back to the list/string uq_poly pair below
        if re.fullmatch(r"-\d+", idx):
            # try_: ANSI element_at errors on out-of-bounds; DuckDB → NULL
            return (
                f"uq_polymapi({operand}, {idx}, "
                f"uq_poly(try_element_at({operand}, {idx}), "
                f"substring({operand}, {idx}, 1)))"
            )
        if re.fullmatch(r"\d+", idx):
            return (
                f"uq_polymapi({operand}, {idx}, "
                f"uq_poly(get({operand}, {int(idx) - 1}), "
                f"substring({operand}, {idx}, 1)))"
            )
        # assumes a list or string (1-based, negative counts from the
        # end). Zero-guard + try_: DuckDB yields NULL for l[0] and any
        # out-of-bounds list index ('' for strings — the dynamic
        # substring gets the batch-8 window translation which
        # reproduces that)
        return (
            f"uq_polymapi({operand}, ({idx}), "
            f"uq_poly((CASE WHEN ({idx}) = 0 THEN NULL "
            f"ELSE try_element_at({operand}, ({idx})) END), "
            f"substring({operand}, ({idx}), 1)))"
        )

    def _bracket_literal(self, inner: str) -> str:
        """`[items]` → array(items); `[expr FOR v IN src [IF cond]]` →
        transform([filter(src, v -> cond)], v -> expr) — DuckDB list
        comprehensions are exactly Spark's higher-order functions."""
        parts = self._split_top(inner, "for")
        if len(parts) == 1:
            return f"array({inner})"
        expr = parts[0].strip()
        in_parts = self._split_top(parts[1], "in")
        if len(in_parts) < 2:
            return f"array({inner})"
        var = in_parts[0].strip()
        tail = "in".join(in_parts[1:]) if len(in_parts) > 2 else in_parts[1]
        cond_parts = self._split_top(tail, "if")
        src = cond_parts[0].strip()
        if len(cond_parts) > 1:
            src = f"filter({src}, {var} -> {cond_parts[1].strip()})"
        return f"transform({src}, {var} -> {expr})"

    def _rewrite_bracket_syntax(self, sql: str) -> str:
        """DuckDB bracket forms → Spark: list literal `[a, b]` →
        array(a, b); comprehension → transform/filter; postfix `l[i]` /
        `l[a:b]` → get/element_at/slice (1-based inclusive semantics —
        verified against DuckDB incl. [0]→NULL and negative indexes).
        Postfix vs literal is decided by the preceding character
        (identifier/')'/']' ⇒ postfix). Recurses into bracket bodies."""
        out: list[str] = []
        i, n = 0, len(sql)
        while i < n:
            c = sql[i]
            if c == "'":
                j = sql.find("'", i + 1)
                j = n if j == -1 else j + 1
                out.append(sql[i:j])
                i = j
                continue
            if c == "[":
                close = self._find_close(sql, i)
                if close == -1:
                    out.append(sql[i:])
                    break
                inner = self._rewrite_bracket_syntax(sql[i + 1 : close])
                head = "".join(out)
                # postfix binds TIGHTLY (`l[2]`, `f(a)[1]`): the char
                # immediately before '[' decides; a space means literal.
                prev = head[-1:]
                if prev and (prev.isalnum() or prev in "_)]'"):
                    pre, operand = self._take_operand(head)
                    out = [pre, self._bracket_postfix(operand, inner)]
                else:
                    out.append(self._bracket_literal(inner))
                i = close + 1
                continue
            out.append(c)
            i += 1
        return "".join(out)

    # SELECT * EXCLUDE (cols) / EXCLUDE col → Spark's * EXCEPT (cols)
    _EXCLUDE_RE = re.compile(r"(?i)(\*\s*)exclude\s*(\(([^)]*)\)|([A-Za-z_]\w*))")

    @classmethod
    def _rewrite_exclude(cls, sql: str) -> str:
        """DuckDB ``SELECT * EXCLUDE (a, b)`` (parens optional for one
        column) → Spark ``* EXCEPT (a, b)``. ``* REPLACE`` is NOT
        translated (needs schema knowledge) — documented deviation."""
        return cls._EXCLUDE_RE.sub(
            lambda m: f"{m.group(1)}EXCEPT ({m.group(3) or m.group(4)})", sql
        )

    @staticmethod
    def _rewrite_int_div(sql: str) -> str:
        """DuckDB ``a // b`` (truncating integer division — same semantics
        as Spark's ``div``, verified incl. negatives) → ``a div b``.
        String literals are skipped so ``'https://…'`` survives."""
        out, i, n = [], 0, len(sql)
        while i < n:
            c = sql[i]
            if c == "'":
                j = sql.find("'", i + 1)
                j = n if j == -1 else j + 1
                out.append(sql[i:j])
                i = j
            elif c == "/" and i + 1 < n and sql[i + 1] == "/":
                out.append(" div ")
                i += 2
            else:
                out.append(c)
                i += 1
        return "".join(out)

    _IN_SUBQ_RE = re.compile(r"(?i)\b(not\s+)?in\s*\(\s*select\b")
    _IN_CLAUSE_KW = {
        "select": "project",
        "where": "filter", "having": "filter", "qualify": "filter",
        "on": "filter", "by": "other", "set": "other",
    }

    def _in_clause_of(self, sql: str, pos: int) -> str:
        """Clause governing position ``pos``: FORWARD literal-aware scan
        (ADVICE r7 — the old backward quote heuristic mispaired escaped
        '' literals and read quoted identifiers as keywords). One
        clause-kind frame per paren depth; keywords inside groups that
        close before ``pos`` are popped away; the nearest enclosing
        frame with a keyword wins — exactly the old backward-walk
        semantics. Double-quoted/backtick identifiers are skipped, ''
        doubling rides the canonical _LIT_RE. Returns 'project' for
        SELECT, 'filter' for WHERE/HAVING/ON/QUALIFY, 'other'
        otherwise; CASE branch keywords are not clause keywords, so a
        CASE inherits its surrounding clause."""
        stack: list[str | None] = [None]
        i = 0
        while i < pos:
            c = sql[i]
            if c == "'":
                m = self._LIT_RE.match(sql, i)
                i = m.end() if m else i + 1
                continue
            if c in ('"', "`"):
                j = sql.find(c, i + 1)
                if j == -1:
                    break
                i = j + 1
                continue
            if c == "(":
                stack.append(None)
                i += 1
                continue
            if c == ")":
                if len(stack) > 1:
                    stack.pop()
                i += 1
                continue
            if c.isalpha() or c == "_":
                j = i
                while j < len(sql) and (sql[j].isalnum() or sql[j] == "_"):
                    j += 1
                kind = self._IN_CLAUSE_KW.get(sql[i:j].lower())
                if kind:
                    stack[-1] = kind
                i = j
                continue
            i += 1
        for k in reversed(stack):
            if k:
                return k
        return "other"

    # bare keywords that must never be swallowed as an IN left operand
    _IN_LHS_STOP_KW = {
        "select", "where", "when", "then", "else", "end", "and", "or",
        "not", "in", "case", "by", "on", "as", "from", "having", "all",
        "distinct", "between", "like", "is", "union", "except",
        "intersect", "limit", "offset", "qualify",
    }

    def _case_start_for_end(self, sql: str, end_tok_start: int):
        """Start index of the CASE matching the END token that begins at
        ``end_tok_start`` (literal-aware forward scan) — None if
        unbalanced."""
        stack: list[int] = []
        for tok in self._DIV_CASE_TOK_RE.finditer(sql):
            w = tok.group(1)
            if not w:
                continue
            if tok.start() > end_tok_start:
                break
            if w.lower() == "case":
                stack.append(tok.start())
            else:
                if tok.start() == end_tok_start:
                    return stack[-1] if stack else None
                if stack:
                    stack.pop()
        return None

    def _in_atom_or_case_left(self, sql: str, i: int):
        """Like _atom_left, but a trailing ``END`` captures the whole
        balanced CASE…END block, and bare clause keywords are rejected
        (never part of an operand). ADVICE r7: without this, projected
        ``CASE … END IN (subquery)`` rewrote only the token END into a
        parse-invalid fragment."""
        ls = self._atom_left(sql, i)
        if ls is None:
            return None
        j = i
        while j > ls and sql[j - 1].isspace():
            j -= 1
        atom = sql[ls:j]
        if atom.lower() == "end":
            return self._case_start_for_end(sql, ls)
        if atom.lower() in self._IN_LHS_STOP_KW:
            return None
        return ls

    def _in_lhs_start(self, sql: str, i: int):
        """Start of the FULL comparison operand ending just before ``i``:
        an atom/CASE block, extended left through top-level arithmetic
        and concat operators (+ - * / % ||) — DuckDB parses
        ``1 + 2 IN (…)`` as ``(1+2) IN (…)`` (IN binds looser than
        arithmetic; ADVICE r7). Comparison operators, keywords and
        clause boundaries stop the walk."""
        ls = self._in_atom_or_case_left(sql, i)
        if ls is None:
            return None
        while True:
            j = ls
            while j > 0 and sql[j - 1].isspace():
                j -= 1
            if j >= 2 and sql[j - 2 : j] == "||":
                op_start = j - 2
            elif (
                j >= 1
                and sql[j - 1] in "+-*/%"
                # not part of a two-char comparison/operator (e.g. ->)
                and not (j >= 2 and sql[j - 2] in "<>=!-+")
            ):
                op_start = j - 1
            else:
                return ls
            nxt = self._in_atom_or_case_left(sql, op_start)
            if nxt is None:
                # unary sign (or keyword before the operator) — keep the
                # sign if it is unary +/-
                if sql[op_start] in "+-":
                    return op_start
                return ls
            ls = nxt

    def _rewrite_in_subquery_null(self, sql: str) -> str:
        """Projected ``x [NOT] IN (SELECT …)`` with a NULL-bearing,
        non-matching subquery: DuckDB yields NULL, Spark FALSE (batch
        28 catch, previously a documented deviation; WHERE/HAVING/ON
        position is value-identical — NULL filters like FALSE — and is
        left on Spark's single-semi-join plan). In SELECT position the
        IN becomes a three-valued CASE: match → TRUE; else a NULL
        subquery element forces NULL; else Spark's own IN (which
        already handles the NULL-probe and empty-subquery corners).
        Multi-column tuple IN ((a,b) IN …) is skipped (left native —
        width-deviation documented). NOT IN wraps the same CASE in
        NOT. The subquery is duplicated (match + has-null probes);
        projected IN-subqueries are rare enough that the extra
        ExistenceJoin is immaterial, and filters keep the fast path."""
        pos = 0
        while True:
            m = self._search_code(self._IN_SUBQ_RE, sql, pos)
            if not m:
                return sql
            if self._in_clause_of(sql, m.start()) != "project":
                pos = m.end()
                continue
            op = sql.find("(", m.start())
            close = self._find_close(sql, op)
            if close == -1:
                pos = m.end()
                continue
            ls = self._in_lhs_start(sql, m.start())
            if ls is None:
                # translate-or-raise: leaving an uncapturable LHS native
                # would silently keep the FALSE-vs-NULL deviation, and a
                # partial capture would reach Catalyst garbled (ADVICE r7)
                raise UQueryError.sql_error(
                    "projected IN (subquery): unsupported left-operand "
                    f"shape before position {m.start()}"
                )
            x = sql[ls:m.start()].strip()
            if x.startswith("(") and len(self._split_top(x[1:-1], ",")) > 1:
                pos = m.end()  # tuple IN — leave native
                continue
            subq = sql[op + 1 : close]
            neg = "NOT " if m.group(1) else ""
            # NULL probe arm is explicit: Spark's InSubquery returns
            # FALSE for a NULL probe COLUMN (the literal-NULL case is
            # constant-folded and looked correct — subq-axis fuzzer
            # catch, round 7); DuckDB: NULL with a nonempty subquery →
            # NULL, with an empty one → FALSE.
            form = (
                f"({neg}CASE WHEN ({x}) IN ({subq}) THEN TRUE "
                f"WHEN ({x}) IS NULL THEN "
                f"(CASE WHEN EXISTS (SELECT 1 FROM ({subq}) uq_inq) "
                f"THEN CAST(NULL AS BOOLEAN) ELSE FALSE END) "
                f"WHEN EXISTS (SELECT 1 FROM ({subq}) uq_inq(uq_inv) "
                f"WHERE uq_inv IS NULL) THEN CAST(NULL AS BOOLEAN) "
                f"ELSE ({x}) IN ({subq}) END)"
            )
            sql = sql[:ls] + form + sql[close + 1 :]
            pos = ls + len(form)

    _DIV_RHS_SKIP = {
        "select", "from", "where", "group", "order", "by", "limit",
        "offset", "having", "union", "all", "distinct", "on", "using",
        "join", "inner", "left", "right", "full", "cross", "and", "or",
        "not", "between", "in", "is", "as", "when", "then", "else",
        "end", "over", "partition", "rows", "range", "interval", "any",
        "some", "exists",
    }
    _DIV_CLAUSE_RE = re.compile(
        r"(?i)(over|filter|ignore\s+nulls|respect\s+nulls|within\s+group)\b"
    )
    _DIV_CASE_TOK_RE = re.compile(r"(?is)'(?:[^']|'')*'|\b(case|end)\b")

    def _div_rhs_end(self, sql: str, i: int):
        """End index (exclusive) of a DIVISOR expression starting at
        ``i``: a CASE…END block, or an atom extended through postfix
        window/aggregate clauses (OVER (spec)/OVER name, FILTER (…),
        WITHIN GROUP (…), IGNORE/RESPECT NULLS) so the clause stays
        attached inside the nullif wrap. None = caller leaves the
        division native (loud ANSI error preserved, no mistranslation
        risk)."""
        n = len(sql)
        j = i
        while j < n and sql[j].isspace():
            j += 1
        if re.match(r"(?i)case\b", sql[j:]):
            depth = 0
            for tok in self._DIV_CASE_TOK_RE.finditer(sql, j):
                w = tok.group(1)
                if not w:
                    continue
                if w.lower() == "case":
                    depth += 1
                else:
                    depth -= 1
                    if depth == 0:
                        return tok.end()
            return None
        end = self._atom_right(sql, i)
        if end is None:
            return None
        while True:
            k = end
            while k < n and sql[k].isspace():
                k += 1
            m = self._DIV_CLAUSE_RE.match(sql, k)
            if not m:
                return end
            kw = m.group(1).lower()
            p = m.end(1)
            if kw.startswith(("ignore", "respect")):
                end = p
                continue
            q = p
            while q < n and sql[q].isspace():
                q += 1
            if q < n and sql[q] == "(":
                close = self._find_close(sql, q)
                if close == -1:
                    return None
                end = close + 1
            elif kw == "over" and q < n and (sql[q].isalpha() or sql[q] == "_"):
                while q < n and (sql[q].isalnum() or sql[q] == "_"):
                    q += 1
                end = q
            else:
                return None

    def _rewrite_div_by_zero(self, sql: str) -> str:
        """DuckDB returns NULL for division/modulo by zero in EVERY
        numeric type (1/0, 1.0/0.0, 1%0, 7//0 all probed NULL — DOUBLE
        included, NOT Infinity) where Spark's ANSI mode raises
        DIVIDE_BY_ZERO / REMAINDER_BY_ZERO — the last loud
        DuckDB-valid-query-fails gap (VERDICT r6 #2, NOTES 'ANSI-mode
        follow-up'). Translation: wrap the DIVISOR in ``nullif(d, 0)``
        — x / NULL is NULL in both engines, the result TYPE is
        unchanged (nullif preserves its first argument's type, so
        int/decimal/double widths stay exactly what Spark computes
        today), operator precedence is untouched (one atom replaced in
        place — no operand-chain parsing), interval dividends keep
        their native path, and no analysis probe is needed. ``//``
        becomes ``div nullif(d, 0)`` here (DuckDB 7//0 is NULL too).
        A divisor that doesn't parse as an atom is left native."""
        i, n = 0, len(sql)
        while i < n:
            c = sql[i]
            if c == "'":
                j = sql.find("'", i + 1)
                i = n if j == -1 else j + 1
                continue
            if c == '"':
                j = sql.find('"', i + 1)
                i = n if j == -1 else j + 1
                continue
            if c == "`":
                j = sql.find("`", i + 1)
                i = n if j == -1 else j + 1
                continue
            if sql.startswith("/*", i):
                j = sql.find("*/", i + 2)
                i = n if j == -1 else j + 2
                continue
            if sql.startswith("--", i):
                j = sql.find("\n", i)
                i = n if j == -1 else j + 1
                continue
            if c in "/%":
                isdd = sql.startswith("//", i)
                oplen = 2 if isdd else 1
                end = self._div_rhs_end(sql, i + oplen)
                if end is None:
                    i += oplen
                    continue
                rhs = sql[i + oplen : end].strip()
                if not rhs or rhs.lower() in self._DIV_RHS_SKIP:
                    i += oplen
                    continue
                if rhs.startswith(("nullif((", "nullif(CAST((")):
                    # already wrapped (this pass runs twice: before the
                    # int_div pass for user `//`, after macro expansion
                    # for macro-introduced divisions)
                    i += oplen
                    continue
                if isdd:
                    # `//` is type-dispatched (wave-4 gap probe, round
                    # 10): DuckDB's floordiv TRUNCATES only for integral
                    # operands; with ANY fractional operand it is PLAIN
                    # division returning DOUBLE (7.5 // 2 = 3.75,
                    # -7.5 // 2 = -3.75, DECIMAL probes DOUBLE) — the
                    # old blanket div was a silent wrong-value class.
                    # Dispatch needs the LHS atom; when it can't be
                    # scanned safely (subscripted/CASE/window operands)
                    # the integer div stays — fractional operands of
                    # those rare shapes remain a documented deviation.
                    ls = self._floordiv_lhs_start(sql, i)
                    if ls is not None:
                        lhs = sql[ls:i].strip()
                        repl = (
                            f"uq_poly((({lhs}) / nullif(CAST(({rhs}) AS DOUBLE), 0)), "
                            f"(((({lhs}) & 0) + (({rhs}) & 0)) + "
                            f"(({lhs}) div nullif(({rhs}), 0))))"
                        )
                        sql = sql[:ls] + repl + sql[end:]
                        n = len(sql)
                        # rescan from the replacement start: the emitted
                        # `/` skips via the nullif guard, divisions
                        # inside the copied operands wrap per copy
                        i = ls
                        continue
                    repl = " div nullif(({}), 0)".format(rhs)
                elif c == "/":
                    # DuckDB's `/` ALWAYS returns DOUBLE (decimal/decimal
                    # probed DOUBLE; 1/2 is 0.5) — casting the DIVISOR
                    # promotes the result to DOUBLE for every numeric
                    # dividend while interval dividends stay native
                    # (interval / double is valid Spark), fixing the
                    # decimal-width/rounding divergence in the same wrap
                    repl = "/ nullif(CAST(({}) AS DOUBLE), 0)".format(rhs)
                else:
                    repl = "% nullif(({}), 0)".format(rhs)
                sql = sql[:i] + repl + sql[end:]
                n = len(sql)
                # do NOT jump past the replacement: the wrapped divisor
                # may itself contain divisions ((a)/(b/0)) — rescan from
                # the operator; the nullif prefix guard skips the wrap
                # we just made and the scan proceeds inside it
                i += oplen
                continue
            i += 1
        return sql

    def _rewrite_distinct_on(self, sql: str) -> str:
        """DuckDB/Postgres ``SELECT DISTINCT ON (keys) list … [ORDER BY o]``
        → first row per key group via a row_number window:

        SELECT * EXCEPT (uq_don) FROM (
          SELECT list, row_number() OVER (PARTITION BY keys ORDER BY o|keys)
                 AS uq_don FROM …) WHERE uq_don = 1 [ORDER BY o]

        The ORDER BY (when present) decides which row survives, matching
        DuckDB; without one the survivor is arbitrary (also DuckDB).
        Outer ORDER BY items that are not select-list aliases or
        ordinals (expressions, or FROM columns absent from the select
        list) are projected as hidden uq_ob<i> columns inside the
        subquery and EXCEPTed back out — the previous emission left
        them in the outer tail where the wrapped subquery could not
        resolve them (r13 shape probe: DISTINCT ON (k % 5) …
        ORDER BY k % 5, price DESC raised UNRESOLVED_COLUMN).
        """
        m = re.match(r"(?is)^(\s*)select\s+distinct\s+on\s*\(", sql)
        if m is None:
            return sql
        depth, i = 1, m.end()
        while i < len(sql) and depth:
            if sql[i] == "'":
                i = sql.index("'", i + 1)
            depth += {"(": 1, ")": -1}.get(sql[i], 0)
            i += 1
        keys = sql[m.end() : i - 1].strip()
        rest = sql[i:]
        hits = list(self._scan_top_level(rest, {"from", "order", "limit"}))
        frm = next(h for h in hits if h[2] == "from")
        order_hit = next((h for h in hits if h[2] == "order"), None)
        limit_hit = next((h for h in hits if h[2] == "limit"), None)
        body_end = order_hit[0] if order_hit else (limit_hit[0] if limit_hit else len(rest))
        if order_hit:
            order_end = limit_hit[0] if limit_hit and limit_hit[0] > order_hit[0] else len(rest)
            order_exprs = re.sub(r"(?is)^order\s+by", "", rest[order_hit[0] : order_end]).strip()
        else:
            order_exprs = keys
        # select-list aliases (top-level AS name, or the bare/qualified
        # column itself) and bare expressions — outer ORDER BY items
        # matching an alias stay put; ordinals expand to the matching
        # select expression INSIDE the window (DuckDB treats DISTINCT
        # ON ordinals as output-column picks — r13 shape probe) but
        # stay ordinal outside
        aliases: dict[str, str] = {}
        sel_exprs: list[str] = []
        for it in self._split_top(rest[: frm[0]], ","):
            it = it.strip()
            pa = self._split_top(it, "as")
            if len(pa) > 1:
                expr = " AS ".join(p.strip() for p in pa[:-1])
                aliases[pa[-1].strip().strip('"').lower()] = expr
                sel_exprs.append(expr)
            else:
                sel_exprs.append(it)
                if re.fullmatch(r"[\w.]+", it):
                    aliases[it.split(".")[-1].lower()] = it
        hidden: list[str] = []
        outer_ob: list[str] = []
        win_ob: list[str] = []
        if order_hit:
            for idx, it in enumerate(self._split_top(order_exprs, ",")):
                it = it.strip()
                m2 = re.match(
                    r"(?is)^(.*?)((?:\s+asc|\s+desc)?"
                    r"(?:\s+nulls\s+(?:first|last))?)\s*$",
                    it,
                )
                core = m2.group(1).strip()
                suffix = (m2.group(2) or "").strip()
                bare = re.fullmatch(r"[\w.]+", core)
                if core.isdigit():
                    n = int(core)
                    if not (1 <= n <= len(sel_exprs)):
                        raise UQueryError.sql_error(
                            f"DISTINCT ON: ORDER BY ordinal {n} out of range"
                        )
                    win_ob.append(f"({sel_exprs[n - 1]}) {suffix}".strip())
                    outer_ob.append(it)
                    continue
                if bare and core.split(".")[-1].lower() in aliases:
                    # window specs can't see sibling select aliases —
                    # substitute the aliased EXPRESSION inside, keep
                    # the alias reference outside
                    win_ob.append(
                        f"({aliases[core.split('.')[-1].lower()]}) {suffix}".strip()
                    )
                    outer_ob.append(it)
                else:
                    win_ob.append(it)
                    hidden.append(f"({core}) AS uq_ob{idx}")
                    outer_ob.append(f"uq_ob{idx} {suffix}".strip())
            order_exprs = ", ".join(win_ob)
        except_cols = ", ".join(
            ["uq_don"] + [h.split(" AS ")[-1] for h in hidden]
        )
        new_tail = ""
        if order_hit:
            new_tail = "ORDER BY " + ", ".join(outer_ob) + " "
        if limit_hit:
            new_tail += rest[limit_hit[0]:]
        hidden_sql = (", " + ", ".join(hidden)) if hidden else ""
        return (
            f"SELECT * EXCEPT ({except_cols}) FROM (SELECT "
            + rest[: frm[0]]
            + hidden_sql
            + f", row_number() OVER (PARTITION BY {keys} ORDER BY {order_exprs}) AS uq_don "
            + rest[frm[0] : body_end]
            + ") WHERE uq_don = 1 "
            + new_tail
        )

    _PIVOT_STMT_RE = re.compile(
        r"(?is)^\s*on\s+(?P<onspec>.+?)"
        r"\s+using\s+(?P<agg>.+?)(?:\s+group\s+by\s+(?P<groups>.+?))?"
        r"(?P<tail>\s+(?:order\s+by|limit)\s.*)?\s*;?\s*$"
    )
    _PIVOT_MAX_VALUES = 500

    def _take_stmt_table(self, sql: str, keyword: str) -> tuple[str, str] | None:
        """For ``<keyword> <tbl> …`` statements: return (tbl, rest) where
        tbl is a (nested-paren-balanced) subquery, a quoted path resolved
        to a view, or a dotted name; None when sql isn't that statement."""
        m = re.match(rf"(?is)^\s*{keyword}\s+", sql)
        if m is None:
            return None
        i = m.end()
        if i < len(sql) and sql[i] == "(":
            close = self._find_close(sql, i)
            if close == -1:
                return None
            return sql[i : close + 1], sql[close + 1 :]
        # A quoted table is a PATH — match the full quoted string (paths
        # contain '/', '-', … that the bare-identifier charset excludes;
        # the old [\w.']+ charset cut "'/data/x.parquet'" at the slash
        # and resolved the empty path — round-5 smoke catch).
        mt = re.match(r"'[^']*'|[\w.]+", sql[i:])
        if mt is None:
            return None
        tbl = mt.group(0)
        if tbl.startswith("'"):
            tbl = self._view_for(tbl.strip("'"), None, {})
        return tbl, sql[i + mt.end() :]

    def _rewrite_pivot_statement(self, sql: str) -> str:
        """DuckDB ``PIVOT tbl ON col USING agg [GROUP BY g] [tail]`` →
        Spark ``SELECT * FROM (SELECT g, col, arg) PIVOT (agg FOR col IN
        (values))``.

        DuckDB auto-discovers the pivoted values; Spark needs them
        literal, so a DISTINCT probe runs first (bounded at 500 values —
        DuckDB materializes the same list internally). Column naming
        matches: bare values for an unaliased aggregate, ``value_alias``
        with one. count(*) pivots a constant column.
        """
        taken = self._take_stmt_table(sql, "pivot")
        if taken is None:
            return sql
        tbl, rest = taken
        m = self._PIVOT_STMT_RE.match(rest)
        if m is None:
            return sql
        onspec, agg = m.group("onspec").strip(), m.group("agg").strip()
        groups = [g.strip() for g in (m.group("groups") or "").split(",") if g.strip()]
        tail = m.group("tail") or ""
        # ON spec: comma-separated pivot exprs, each with an optional
        # `IN (literal list)` (round 9: multi-column cross-product and
        # expression pivots — DuckDB first-class forms)
        items: list[tuple[str, str | None]] = []
        for part in self._split_top(onspec, ","):
            part = part.strip()
            mi = re.match(r"(?is)^(.+?)\s+in\s*\((.*)\)\s*$", part)
            items.append(
                (mi.group(1).strip(), mi.group(2)) if mi else (part, None)
            )
        if not groups:
            # DuckDB statement-form PIVOT without GROUP BY groups
            # implicitly by every source column not pivoted ON and not
            # referenced by the aggregate (round-9 pivotfz follow-up —
            # the old translation aggregated everything into one row, a
            # silent shape deviation). LIMIT-0 schema probe, identifier
            # scan of the aggregate + ON texts for the reference check.
            with _probe_quiet():
                src_cols = self.spark.sql(
                    f"SELECT * FROM {tbl} uq_pv_cols LIMIT 0"
                ).columns
            used_ids = self._pivot_expr_ids(
                [agg]
                + [
                    expr
                    for expr, _iv in items
                    if not re.fullmatch(r"[\w.]+", expr)
                ]
            )
            on_cols = {
                expr.lower() for expr, _iv in items
                if re.fullmatch(r"[\w.]+", expr)
            }
            groups = [
                c for c in src_cols
                if c.lower() not in on_cols and c.lower() not in used_ids
            ]
        agg_list = self._split_top(agg, ",")
        simple = len(items) == 1 and re.fullmatch(r"[\w.]+", items[0][0])
        if not simple:
            if len(agg_list) > 1:
                raise UQueryError.sql_error(
                    "PIVOT: several aggregates combined with several ON "
                    "columns / ON expressions are not supported"
                )
            return self._pivot_statement_general(tbl, items, agg, groups, tail)
        col, invals = items[0]
        if len(agg_list) > 1:
            return self._pivot_statement_multi(
                tbl, col, agg_list, groups, tail, invals
            )
        am = re.match(r"(?is)^(\w+)\s*\((.*)\)\s*(?:as\s+(\w+))?$", agg)
        if am is None:
            raise UQueryError.sql_error(f"unsupported PIVOT aggregate: {agg[:60]}")
        fn, arg, alias = am.group(1), am.group(2).strip(), am.group(3)
        star = arg == "*"
        if star:
            fn, arg = "count", "1"
        vals = self._pivot_values(tbl, col, invals)
        def lit(v):
            """(IN-list text, output column name) for one pivot value.
            DuckDB names pivoted columns value_alias (Spark ignores the
            aggregate alias for a single agg, so the IN values carry
            it); an empty-string value with no alias falls back to
            DuckDB's filtered-aggregate expression text (round-9
            pivotfz fuzzer catch). Any name that is not a plain
            identifier travels as a late-substituted token — emitted
            raw, later passes would rewrite it in place (VARCHAR→
            STRING, `a!` factorial expansion — round-9/10 classes)."""
            base = (
                "'" + v.replace("'", "''") + "'"
                if isinstance(v, str)
                else "NULL" if v is None else str(v)
            )
            vstr = "NULL" if v is None else str(v)
            if alias:
                name = f"{vstr}_{alias}"
            elif isinstance(v, str) and v == "":
                name = self._pivot_filter_name(fn, arg, star, [col])
            else:
                name = vstr
            if re.fullmatch(r"\w+", name):
                # NULL values always carry the AS: Spark's default name
                # for a null pivot value ('null') differs from DuckDB's
                return (f"{base} AS `{name}`" if alias or v is None else base), name
            tok = self._pivot_name_token(name)
            return f"{base} AS `{tok}`", tok

        pairs = [lit(v) for v in vals]
        lits = ", ".join(p[0] for p in pairs)
        proj = ", ".join([*groups, col, f"({arg}) AS uq_pv"])
        agg_sql = f"{fn}(uq_pv)"
        pivoted = (
            f"SELECT * FROM (SELECT {proj} FROM {tbl} uq_pv_src) "
            f"PIVOT ({agg_sql} FOR {col} IN ({lits}))"
        )
        if fn.lower() == "count":
            # DuckDB's count pivot fills absent (group, value) cells
            # with 0; Spark's PIVOT yields NULL there (round-9 pivotfz
            # fuzzer catch). The value list is ours, so the output
            # columns are known — coalesce each to 0.
            esc = [p[1].replace("`", "``") for p in pairs]
            sel = [*groups, *(f"coalesce(`{n}`, 0) AS `{n}`" for n in esc)]
            pivoted = f"SELECT {', '.join(sel)} FROM ({pivoted}) uq_pv_cnt"
        return pivoted + tail

    def _pivot_name_token(self, name: str) -> str:
        """Register a pivot output-column name for late substitution at
        the rewrite() tail and return its placeholder token. Names that
        read like SQL (DuckDB FILTER-expression-text names for
        empty-string pivot values) or contain non-identifier characters
        would be rewritten in place by later passes — tokens are plain
        identifiers and survive. Monotonic counter (round-10 ADVICE:
        ``len(subs)``-derived names collided with stale keys after
        pops); backticks escaped HERE, the single point where a data
        value enters a quoted identifier (round-10 ADVICE: the multi
        path stored names unescaped → unparsable generated SQL)."""
        tok = f"uq_pvn_{self._pivot_name_seq}"
        self._pivot_name_seq += 1
        self._pivot_name_subs[tok] = name.replace("`", "``")
        return tok

    @staticmethod
    def _pivot_combo_name(values: tuple, alias: str | None) -> str:
        """DuckDB's multi-ON pivot column name: values joined with '_'
        EXCEPT that the separator is skipped while the accumulated name
        is still empty (probed: ('','b')→'b', ('y','')→'y_',
        ('a','','c')→'a__c'); an alias is then appended with an
        unconditional '_' (('','b') AS s→'b_s', ('','') AS s→'_s').
        An all-empty combo with no alias yields '' — the caller falls
        back to DuckDB's FILTER-expression-text name. Explicit NULL
        values render as 'NULL' (DuckDB's column name for them)."""
        name = ""
        for v in values:
            vs = "NULL" if v is None else str(v)
            name = f"{name}_{vs}" if name else vs
        if alias:
            name = f"{name}_{alias}"
        return name

    @staticmethod
    def _pivot_filter_name(
        fn: str, arg: str, star: bool, on_exprs: list[str]
    ) -> str:
        """DuckDB's fallback column name when the joined pivot-value
        name is empty (all values ''): the internal filtered-aggregate
        expression text, e.g. ``sum(x) FILTER (WHERE ((CAST(a AS
        VARCHAR) IS NOT DISTINCT FROM '') AND (CAST(b AS VARCHAR) IS
        NOT DISTINCT FROM '')))`` — plain-identifier args/ON columns
        render bare, any other expression parenthesized; count(*)
        prints count_star(); several conditions AND-joined inside one
        extra paren pair (all probed against DuckDB 1.x)."""
        arg_text = arg if re.match(r"^\w+$", arg) else f"({arg})"
        head = "count_star()" if star else f"{fn}({arg_text})"
        conds = [
            "(CAST({} AS VARCHAR) IS NOT DISTINCT FROM '')".format(
                e if re.fullmatch(r"[\w.]+", e) else f"({e})"
            )
            for e in on_exprs
        ]
        cond = conds[0] if len(conds) == 1 else f"({' AND '.join(conds)})"
        return f"{head} FILTER (WHERE {cond})"

    @staticmethod
    def _pivot_expr_ids(texts: list[str]) -> set[str]:
        """Identifier tokens that can be COLUMN REFERENCES in the given
        aggregate/ON expression texts — for DuckDB's implicit statement-
        PIVOT grouping (every source column not pivoted ON and not
        referenced by the aggregate). Round-10 ADVICE: the raw token
        scan also matched function names, AS-alias names, and words
        inside string literals, silently dropping source columns named
        e.g. ``sum`` from the implicit grouping (probed: DuckDB groups
        by all three). Strip string literals, drop AS-alias tokens,
        ignore tokens immediately followed by '(' (calls)."""
        ids: set[str] = set()
        for text in texts:
            txt = re.sub(r"'(?:[^']|'')*'", " ", text)
            txt = re.sub(r"(?i)\bas\s+[A-Za-z_]\w*", " ", txt)
            for m in re.finditer(r"([A-Za-z_]\w*)\s*(\()?", txt):
                if m.group(2) is None:
                    ids.add(m.group(1).lower())
        return ids

    def _pivot_values(self, tbl: str, col: str, invals: str | None) -> list:
        """Pivot value list: explicit ``ON col IN (…)`` literals when
        given (DuckDB keeps listed values verbatim, absent ones
        included), else the cached/bounded DISTINCT discovery probe."""
        if invals is not None:
            vals = []
            for tokv in self._split_top(invals, ","):
                tokv = tokv.strip()
                sv = self._lit_parse(tokv)
                if sv is not None:
                    vals.append(sv)
                elif tokv.upper() == "NULL":
                    # DuckDB pivots an explicit NULL into a column named
                    # 'NULL' aggregating the NULL-valued rows; Spark's
                    # PIVOT IN matches NULL literals null-safely (probed
                    # round 10) so the value passes straight through
                    vals.append(None)
                elif re.fullmatch(r"-?\d+", tokv):
                    vals.append(int(tokv))
                elif re.fullmatch(r"-?\d*\.\d+", tokv):
                    vals.append(float(tokv))
                else:
                    raise UQueryError.sql_error(
                        f"PIVOT IN list: literal values only, got {tokv[:40]}"
                    )
            return vals
        cache_key = (tbl, col)
        vals = self._pivot_vals.get(cache_key)
        if vals is None:
            # NULL is dropped from DISCOVERED values (DuckDB probes,
            # round-10 pivotfz fuzzer catch at seed 660001: a NULL
            # discovered value previously leaked the Python repr 'None'
            # into the generated IN list — an unresolvable-column
            # reject); the +2 bound keeps the over-limit check exact
            # when one slot was a NULL
            vals = [
                r[0]
                for r in self.spark.sql(
                    f"SELECT DISTINCT {col} FROM {tbl} uq_pv_src ORDER BY 1 "
                    f"LIMIT {self._PIVOT_MAX_VALUES + 2}"
                ).collect()
                if r[0] is not None
            ]
            # Bound memory on a long-lived server (many distinct pivot
            # sources) with a simple wholesale reset — re-probing is
            # cheap relative to an unbounded dict, and a reset also
            # re-reads sources that changed on disk. UQ_PIVOT_CACHE=0
            # disables caching entirely for sessions whose file-backed
            # sources mutate (staleness trade documented in __init__).
            if os.environ.get("UQ_PIVOT_CACHE", "1") != "0":
                if len(self._pivot_vals) >= 256:
                    self._pivot_vals.clear()
                self._pivot_vals[cache_key] = vals
        if len(vals) > self._PIVOT_MAX_VALUES:
            raise UQueryError.sql_error(
                f"PIVOT ON {col} exceeds {self._PIVOT_MAX_VALUES} distinct values"
            )
        return vals

    def _pivot_statement_general(
        self,
        tbl: str,
        items: list[tuple[str, str | None]],
        agg: str,
        groups: list[str],
        tail: str,
    ) -> str:
        """Multi-column / expression ON specs (round 9): DuckDB
        ``PIVOT t ON a, b USING sum(x)`` emits the CROSS PRODUCT of the
        columns' value sets named ``{v1}_{v2}[_alias]`` (absent combos
        NULL, count 0); ``ON expr`` pivots an expression with the value
        text as the name. Spark's multi-column PIVOT takes value TUPLES
        with aliases — pivot columns are synthesized as uq_pvc{k} so
        expressions work uniformly. One aggregate; an all-empty-string
        combo with no alias takes DuckDB's FILTER-expression-text name
        (round-10 — previously a loud 400)."""
        am = re.match(r"(?is)^(\w+)\s*\((.*)\)\s*(?:as\s+(\w+))?$", agg.strip())
        if am is None:
            raise UQueryError.sql_error(f"unsupported PIVOT aggregate: {agg[:60]}")
        fn, arg, alias = am.group(1), am.group(2).strip(), am.group(3)
        star = arg == "*"
        if star:
            fn, arg = "count", "1"
        vals_per = [
            self._pivot_values(tbl, expr, iv) for expr, iv in items
        ]
        from itertools import product

        combos = list(product(*vals_per))
        if len(combos) > self._PIVOT_MAX_VALUES:
            raise UQueryError.sql_error(
                f"PIVOT ON cross product exceeds {self._PIVOT_MAX_VALUES} values"
            )

        def vlit(v):
            if isinstance(v, str):
                return "'" + v.replace("'", "''") + "'"
            return "NULL" if v is None else str(v)

        pcols = [f"uq_pvc{k}" for k in range(len(items))]
        proj = ", ".join(
            [*groups]
            + [f"({expr}) AS {pc}" for (expr, _iv), pc in zip(items, pcols)]
            + [f"({arg}) AS uq_pv"]
        )
        def emit_name(name: str) -> str:
            """Backtick-safe emission: any non-identifier name travels
            as a late-substituted token — names like 'a!' otherwise get
            rewritten in place by later passes (the postfix-factorial
            pass expanded `a!` inside backticks — same class as the
            FILTER-text names)."""
            if re.fullmatch(r"\w+", name):
                return name
            return self._pivot_name_token(name)

        # DuckDB combo naming: skip-empty '_' join + unconditional alias
        # append (round-10: the plain "_".join deviated silently on
        # mixed '' combos — ('','b') AS s is 'b_s', not '_b_s'); a
        # fully-empty unaliased combo (at most one per pivot — every ON
        # value '') takes the FILTER-expression-text fallback (round-9
        # pivotfz fuzzer corner, previously a loud 400)
        names = [
            emit_name(
                self._pivot_combo_name(c, alias)
                or self._pivot_filter_name(
                    fn, arg, star, [expr for expr, _iv in items]
                )
            )
            for c in combos
        ]
        def clit(c, name):
            t = (
                f"({', '.join(vlit(v) for v in c)})"
                if len(c) > 1
                else vlit(c[0])
            )
            return f"{t} AS `{name}`"

        lits = ", ".join(clit(c, n) for c, n in zip(combos, names))
        fr = f"({', '.join(pcols)})" if len(pcols) > 1 else pcols[0]
        pivoted = (
            f"SELECT * FROM (SELECT {proj} FROM {tbl} uq_pv_src) "
            f"PIVOT ({fn}(uq_pv) FOR {fr} IN ({lits}))"
        )
        if fn.lower() == "count":
            sel = [*groups, *(f"coalesce(`{n}`, 0) AS `{n}`" for n in names)]
            pivoted = f"SELECT {', '.join(sel)} FROM ({pivoted}) uq_pv_gen"
        return pivoted + tail

    def _pivot_statement_multi(
        self,
        tbl: str,
        col: str,
        agg_list: list[str],
        groups: list[str],
        tail: str,
        invals: str | None,
    ) -> str:
        """Multi-aggregate statement PIVOT (round 9 — previously raised):
        ``PIVOT t ON c USING sum(a) AS s, count(*) …``. DuckDB output:
        group columns, then value-major ``{val}_{alias}`` (aliased) /
        ``{val}_{agg text}`` (unaliased — plain args bare, others
        parenthesized, count(*) prints count_star()). Spark's PIVOT
        requires aliases with several aggregates, so members get
        synthetic ``uq_pa{k}`` aliases and an outer projection renames
        ``{val}_uq_pa{k}`` to DuckDB's names (token-substituted at the
        rewrite() tail — the unaliased names read like SQL). Count
        members coalesce absent cells to 0 like the single path."""
        members = []
        for a in agg_list:
            am = re.match(r"(?is)^(\w+)\s*\((.*)\)\s*(?:as\s+(\w+))?$", a.strip())
            if am is None:
                raise UQueryError.sql_error(
                    f"unsupported PIVOT aggregate: {a.strip()[:60]}"
                )
            fn, arg, alias = am.group(1), am.group(2).strip(), am.group(3)
            star = arg == "*"
            if star:
                fn, arg = "count", "1"
            members.append((fn, arg, alias, star))
        vals = self._pivot_values(tbl, col, invals)
        # empty-string values need no special naming here: with several
        # aggregates DuckDB just prefixes '_' — `_t1`, `_count_star()` —
        # which the {v}_{alias-or-text} formula already produces
        if not groups:
            with _probe_quiet():
                src_cols = self.spark.sql(
                    f"SELECT * FROM {tbl} uq_pv_cols LIMIT 0"
                ).columns
            agg_ids = self._pivot_expr_ids(agg_list)
            groups = [
                c for c in src_cols
                if c.lower() != col.lower() and c.lower() not in agg_ids
            ]
        proj = ", ".join(
            [*groups, col]
            + [f"({arg}) AS uq_pv{k}" for k, (_f, arg, _a, _s) in enumerate(members)]
        )
        agg_sql = ", ".join(
            f"{fn}(uq_pv{k}) AS uq_pa{k}"
            for k, (fn, _arg, _al, _st) in enumerate(members)
        )

        def vlit(v):
            if isinstance(v, str):
                return "'" + v.replace("'", "''") + "'"
            return "NULL" if v is None else str(v)

        # explicit NULL values carry an AS so Spark's generated column
        # prefix is deterministic ('NULL', matching DuckDB's name)
        lits = ", ".join(
            vlit(v) + (" AS `NULL`" if v is None else "") for v in vals
        )
        inner = (
            f"SELECT * FROM (SELECT {proj} FROM {tbl} uq_pv_src) "
            f"PIVOT ({agg_sql} FOR {col} IN ({lits}))"
        )
        out = list(groups)
        for v in vals:
            vs = "NULL" if v is None else v
            for k, (fn, arg, alias, star) in enumerate(members):
                src = f"`{vs}_uq_pa{k}`"
                if alias:
                    name = f"{vs}_{alias}"
                else:
                    arg_text = arg if re.match(r"^\w+$", arg) else f"({arg})"
                    head = "count_star()" if star else f"{fn}({arg_text})"
                    name = f"{vs}_{head}"
                tok = self._pivot_name_token(name)
                expr = f"coalesce({src}, 0)" if fn.lower() == "count" else src
                out.append(f"{expr} AS `{tok}`")
        return f"SELECT {', '.join(out)} FROM ({inner}) uq_pv_multi{tail}"

    _UNPIVOT_STMT_RE = re.compile(
        r"(?is)^\s*on\s+(?P<cols>.+?)"
        r"\s+into\s+name\s+(?P<name>\w+)\s+value\s+(?P<value>\w+)"
        r"(?P<tail>\s+(?:order\s+by|limit)\s.*)?\s*;?\s*$"
    )

    def _rewrite_unpivot_statement(self, sql: str) -> str:
        """DuckDB ``UNPIVOT tbl ON c1, c2 INTO NAME n VALUE v [tail]`` →
        Spark ``SELECT * FROM tbl UNPIVOT (v FOR n IN (c1, c2)) [tail]``
        — a direct syntactic mapping (both melt the named columns and
        keep the rest as identifiers)."""
        taken = self._take_stmt_table(sql, "unpivot")
        if taken is None:
            return sql
        tbl, rest = taken
        m = self._UNPIVOT_STMT_RE.match(rest)
        if m is None:
            return sql
        return (
            f"SELECT * FROM {tbl} uq_unpv UNPIVOT ({m.group('value')} FOR {m.group('name')} "
            f"IN ({m.group('cols').strip()})){m.group('tail') or ''}"
        )

    def _rewrite_from_first(self, sql: str) -> str:
        """DuckDB FROM-first syntax: ``FROM t`` → ``SELECT * FROM t``;
        ``FROM t SELECT cols …`` → ``SELECT cols … FROM t``. The FROM
        part ends at the first top-level SELECT (or never — bare form)."""
        m = re.match(r"(?is)^(\s*)from\s", sql)
        if m is None:
            return sql
        body = sql[m.end(1) :]
        sel = next((h for h in self._scan_top_level(body, {"select"})), None)
        if sel is None:
            return f"SELECT * {body}"
        from_part = body[: sel[0]].strip()
        rest = body[sel[1] :]
        # clauses after the select list (WHERE/GROUP BY/HAVING/ORDER BY/
        # LIMIT — DuckDB's accepted order) re-attach after the FROM part
        # in conventional clause order
        tail_hit = next(
            (h for h in self._scan_top_level(rest, {"where", "group", "having", "order", "limit"})),
            None,
        )
        if tail_hit:
            return f"SELECT {rest[: tail_hit[0]].strip()} {from_part} {rest[tail_hit[0]:]}"
        return f"SELECT {rest.strip()} {from_part}"

    _UNION_BY_NAME_RE = re.compile(r"(?i)\bunion\s+(all\s+)?by\s+name\b")

    def _rewrite_union_by_name(self, sql: str) -> str:
        """DuckDB ``a UNION [ALL] BY NAME b`` → column-aligned UNION:
        result columns are the union of both sides' names in first-seen
        left-to-right order (verified), missing columns fill with typed
        NULLs (types from the first side that has the column, via LIMIT-0
        probes), and the ALL/distinct semantics of each step carry over.
        Top-level statement only; a trailing ORDER BY/LIMIT applies to
        the whole union and is lifted outside."""
        # split into segments at top-level UNION [ALL] BY NAME
        segments: list[str] = []
        ops: list[str] = []
        pos = 0
        while True:
            m = None
            for cand in self._UNION_BY_NAME_RE.finditer(sql, pos):
                depth = 0
                ok = True
                i = pos
                s = sql
                while i < cand.start():
                    c = s[i]
                    if c == "'":
                        j = s.find("'", i + 1)
                        i = len(s) if j == -1 else j
                    elif c in "([":
                        depth += 1
                    elif c in ")]":
                        depth -= 1
                    i += 1
                ok = depth == 0
                if ok:
                    m = cand
                    break
            if m is None:
                break
            segments.append(sql[pos : m.start()])
            ops.append("UNION ALL" if m.group(1) else "UNION")
            pos = m.end()
        if not segments:
            return sql
        segments.append(sql[pos:])
        # lift a trailing top-level ORDER BY / LIMIT off the last segment
        tail = ""
        last = segments[-1]
        hits = [h for h in self._scan_top_level(last, {"order", "limit"})]
        if hits:
            cut = min(h[0] for h in hits)
            tail = " " + last[cut:].strip()
            segments[-1] = last[:cut]
        cols: list[str] = []
        types: dict[str, str] = {}
        schemas = []
        for seg in segments:
            schema = self.spark.sql(
                f"SELECT * FROM ({self._rewrite_len(seg)}) uq_ubn LIMIT 0"
            ).schema
            schemas.append({f.name: f.dataType.simpleString() for f in schema.fields})
            for f in schema.fields:
                if f.name not in types:
                    cols.append(f.name)
                    types[f.name] = f.dataType.simpleString()
        selects = []
        for seg, have in zip(segments, schemas):
            sel = ", ".join(
                f"`{c}`" if c in have else f"CAST(NULL AS {types[c]}) AS `{c}`" for c in cols
            )
            selects.append(f"SELECT {sel} FROM ({seg}) uq_ubn")
        joined = selects[0]
        for op, s in zip(ops, selects[1:]):
            joined += f" {op} {s}"
        return joined + tail

    _COLUMNS_RE = re.compile(
        r"(?i)(?:(?P<fn>\w+)\s*\(\s*)?\bcolumns\s*\(\s*'(?P<pat>[^']+)'\s*\)(?(fn)\s*\))"
    )
    _COLUMNS_STAR_RE = re.compile(r"(?i)\bcolumns\s*\(\s*\*\s*\)")
    _COLUMNS_LAMBDA_RE = re.compile(
        r"(?i)\bcolumns\s*\(\s*(\w+)\s*->\s*\1\s+(?P<neg>not\s+)?like\s+"
        r"'(?P<pat>[^']*)'\s*\)"
    )

    @staticmethod
    def _columns_lambda_to_regex(m: "re.Match[str]") -> str:
        """``COLUMNS(c -> c [NOT] LIKE 'pat')`` → the quoted-regex form:
        LIKE is a FULL match (anchored), % → .*, _ → . — NOT LIKE becomes
        a negative lookahead that still consumes the name (sweep batch 7;
        DuckDB-verified on min(COLUMNS(c -> c LIKE 'x%')))."""
        rx = "".join(
            ".*" if ch == "%" else "." if ch == "_" else re.escape(ch)
            for ch in m.group("pat")
        )
        full = f"^(?!{rx}$).*$" if m.group("neg") else f"^{rx}$"
        return f"COLUMNS('{full}')"

    def _rewrite_columns_expr(self, sql: str) -> str:
        sql = self._COLUMNS_STAR_RE.sub("COLUMNS('.*')", sql)
        sql = self._COLUMNS_LAMBDA_RE.sub(self._columns_lambda_to_regex, sql)
        return self._rewrite_columns_expr_impl(sql)

    def _rewrite_columns_expr_impl(self, sql: str) -> str:
        """DuckDB ``COLUMNS('regex')`` → the matching columns, expanded
        from a LIMIT-0 probe of the query with the expression replaced by
        ``*``. A wrapping aggregate ``fn(COLUMNS('re'))`` applies fn per
        column, aliased back to the column name (DuckDB's naming)."""
        if not self._COLUMNS_RE.search(sql):
            return sql
        probe = self._COLUMNS_RE.sub("*", sql)
        # the probe only needs the select list + FROM: drop trailing
        # clauses (a bare * under the query's GROUP BY would not analyze)
        cut = next(
            (h[0] for h in self._scan_top_level(probe, {"group", "having", "order", "limit"})),
            None,
        )
        if cut is not None:
            probe = probe[:cut]
        # the probe must analyze NOW — resolve polymorphic subscripts,
        # len() and DuckDB type names that the main pipeline maps later
        probe = self._rewrite_poly_subscript(probe)
        schema = self.spark.sql(
            f"SELECT * FROM ({self._rewrite_len(self._rewrite_cast(probe))}) uq_cols LIMIT 0"
        ).schema
        names = list(dict.fromkeys(schema.fieldNames()))

        def sub(m: re.Match) -> str:
            rx = re.compile(m.group("pat"))
            # DuckDB matches the pattern ANYWHERE in the name (verified:
            # 'f_' matches both f_a and off_b) — search, not fullmatch
            cols = [c for c in names if rx.search(c)]
            if not cols:
                raise UQueryError.sql_error(f"COLUMNS('{m.group('pat')}') matches nothing")
            if m.group("fn"):
                fn = m.group("fn")
                return ", ".join(f"{fn}(`{c}`) AS `{c}`" for c in cols)
            return ", ".join(f"`{c}`" for c in cols)

        return self._COLUMNS_RE.sub(sub, sql)

    _STAR_REPLACE_RE = re.compile(r"(?i)\*\s*replace\s*\(")

    def _rewrite_star_replace(self, sql: str) -> str:
        """DuckDB ``SELECT * REPLACE (expr AS col, …)`` → explicit select
        list with the named columns swapped for their expressions. Spark
        has no REPLACE modifier, so the column list comes from a LIMIT-0
        schema probe of the query with plain ``*`` (analysis only, no
        execution — the same trick SUMMARIZE uses). Top-level SELECT
        only; path tables/TVFs are already resolved by earlier passes.
        """
        m = self._STAR_REPLACE_RE.search(sql)
        if m is None:
            return sql
        close = self._find_close(sql, sql.index("(", m.start()))
        if close == -1:
            return sql
        repl: dict[str, str] = {}
        for entry in self._split_top(sql[sql.index("(", m.start()) + 1 : close], ","):
            parts = re.split(r"(?i)\s+as\s+", entry.strip())
            if len(parts) != 2:
                raise UQueryError.sql_error(f"bad * REPLACE entry: {entry.strip()[:60]}")
            repl[parts[1].strip().strip('"').lower()] = parts[0].strip()
        probe = sql[: m.start()] + "*" + sql[close + 1 :]
        # len() resolves last in the main pipeline, but this probe must
        # analyze NOW — resolve subscripts + len() in the probe text only
        probe = self._rewrite_poly_subscript(probe)
        schema = self.spark.sql(
            f"SELECT * FROM ({self._rewrite_len(self._rewrite_cast(probe))}) uq_probe LIMIT 0"
        ).schema
        cols = [
            f"({repl[f.name.lower()]}) AS {f.name}" if f.name.lower() in repl else f"`{f.name}`"
            for f in schema.fields
        ]
        return sql[: m.start()] + ", ".join(cols) + sql[close + 1 :]

    # DuckDB (C strftime) → Java/Spark datetime pattern codes
    _STRF_CODES = {
        "%Y": "yyyy", "%y": "yy", "%m": "MM", "%d": "dd", "%H": "HH",
        "%I": "hh", "%M": "mm", "%S": "ss", "%f": "SSSSSS", "%g": "SSS",
        "%j": "DDD", "%a": "EEE", "%A": "EEEE", "%b": "MMM", "%B": "MMMM",
        # %z/%Z: the gateway serves naive (NTZ) timestamps, where DuckDB
        # prints '+00' and '' (probed) — Java 'x' renders exactly '+00';
        # %c/%x/%X are the ISO composites (probed: %c has NO fractional
        # part); %n is 9-digit nanoseconds = micros·1000 (probed
        # '123456000') — SSSSSS plus a literal '000' (round-12 wave-11)
        "%p": "a", "%Z": "", "%z": "x", "%%": "%",
        "%c": "yyyy-MM-dd HH:mm:ss", "%x": "yyyy-MM-dd", "%X": "HH:mm:ss",
        "%n": "SSSSSS'000'",
        # dash-modified codes: no zero padding (r13 gap probe — these
        # worked in DuckDB 1.0.0 but raised here). Java single letters
        # print unpadded and parse 1+ digits, covering both directions;
        # %-y has no Java pattern (unpadded year-without-century,
        # probed '5' for 2005) → expression segment, strftime only.
        "%-d": "d", "%-m": "M", "%-H": "H", "%-I": "h",
        "%-M": "m", "%-S": "s", "%-j": "D",
    }
    # strptime is LENIENT about zero padding (strptime('3|2024',
    # '%m|%Y') parses in DuckDB; Java 'MM' demands 2 digits) — parsing
    # calls try the strict pattern first, then this 1-or-2-digit
    # overlay (wave-4 gap probe, round 10)
    _STRF_LENIENT = {
        "%m": "M", "%d": "d", "%H": "H", "%I": "h", "%M": "m",
        "%S": "s", "%j": "D",
        "%c": "y-M-d H:m:s", "%x": "y-M-d", "%X": "H:m:s",
        # DuckDB %Y parses 1-4 digit years ('1' → year 1 — b45 catch)
        "%Y": "y",
    }
    # Week-number codes Java patterns CANNOT express (Spark removed
    # 'w'/'W' in 3.0): emitted as expression segments spliced into a
    # concat() around the date_format runs (wave-4 gap probe, round 10).
    # %V/%G are ISO (weekofyear IS ISO week; ISO year = year of that
    # week's Thursday); %U counts from the first Sunday (day-of-week
    # Sunday=0), %W from the first Monday — the C-library formulas
    # (doy + 6 - dow) div 7, zero-padded. DuckDB-pinned in battery36.
    _STRF_EXPR_CODES = {
        "%V": "lpad(CAST(weekofyear({d}) AS STRING), 2, '0')",
        "%G": (
            "lpad(CAST(year(date_add(CAST(({d}) AS DATE), "
            "3 - weekday(({d})))) AS STRING), 4, '0')"
        ),
        "%U": (
            "lpad(CAST(((dayofyear({d}) + 6 - (dayofweek({d}) - 1)) div 7) "
            "AS STRING), 2, '0')"
        ),
        "%W": (
            "lpad(CAST(((dayofyear({d}) + 6 - weekday({d})) div 7) "
            "AS STRING), 2, '0')"
        ),
        # %u ISO day-of-week Mon=1..Sun=7, %w C day-of-week Sun=0..Sat=6
        # — DuckDB prints both UNPADDED single digits (probed '4')
        "%u": "CAST(weekday({d}) + 1 AS STRING)",
        "%w": "CAST(dayofweek({d}) - 1 AS STRING)",
        # %-y: unpadded year-without-century (probed: 2005 → '5')
        "%-y": "CAST(year({d}) % 100 AS STRING)",
    }
    _STRF_RE = re.compile(r"(?i)\b(strftime|try_strptime|strptime)\s*\(")

    def _rewrite_strftime(self, sql: str) -> str:
        """DuckDB ``strftime(ts, '%Y-%m-%d')`` / ``strptime(s, fmt)`` →
        Spark ``date_format(ts, 'yyyy-MM-dd')`` / ``to_timestamp(s,
        fmt)`` with C format codes mapped to Java pattern letters.
        Literal format strings only; unknown %-codes raise (silent
        mistranslation would corrupt results). Literal text inside the
        format that is a Java pattern letter gets quoted by the code map
        being total over the %-escapes — plain characters pass through,
        which matches separators (-, /, :, space)."""

        def xlate_parts(
            fmt: str, allow_expr: bool, lenient: bool = False
        ) -> list[tuple[str, str]]:
            """("pat", javapattern) / ("expr", sqltext-with-{d}) runs.

            Literal letters accumulate into ONE Java quoted block
            ('wk', not 'w''k' — adjacent blocks read as literal-quote
            in Java, a latent mistranslation the wave-4 probe exposed);
            a literal apostrophe becomes the Java '' escape. Embedding
            into a SQL string literal is the CALLER's job (_strf_sql)."""
            out: list[tuple[str, str]] = []

            def emit_pat(txt: str, lit: bool = False) -> None:
                if lit:
                    if out and out[-1][0] == "pat" and out[-1][1].endswith("'"):
                        out[-1] = ("pat", out[-1][1][:-1] + txt + "'")
                        return
                    txt = f"'{txt}'"
                if out and out[-1][0] == "pat":
                    out[-1] = ("pat", out[-1][1] + txt)
                else:
                    out.append(("pat", txt))

            i = 0
            while i < len(fmt):
                if fmt[i] == "%":
                    # dash-modified codes are 3 chars (%-d)
                    width = 3 if fmt[i : i + 2] == "%-" else 2
                    code = fmt[i : i + width]
                    if code in self._STRF_CODES:
                        emit_pat(
                            self._STRF_LENIENT.get(code, self._STRF_CODES[code])
                            if lenient
                            else self._STRF_CODES[code]
                        )
                    elif allow_expr and code in self._STRF_EXPR_CODES:
                        out.append(("expr", self._STRF_EXPR_CODES[code]))
                    else:
                        raise UQueryError.sql_error(f"unsupported strftime code {code}")
                    i += width
                else:
                    if fmt[i].isalpha():  # literal letter → quoted block
                        emit_pat(fmt[i], lit=True)
                    elif fmt[i] == "'":  # literal apostrophe → Java ''
                        emit_pat("''")
                    else:
                        emit_pat(fmt[i])
                    i += 1
            return out

        def _strf_sql(pattern: str) -> str:
            """Java pattern text → SQL string literal (quotes doubled)."""
            return "'" + pattern.replace("'", "''") + "'"

        def xlate(fmt: str, lenient: bool = False) -> str:
            parts = xlate_parts(fmt, allow_expr=False, lenient=lenient)
            return "".join(p[1] for p in parts)

        def year_defaulted(parse_expr: str, fmt: str) -> str:
            """DuckDB strptime defaults missing fields to 1900-01-01
            where Spark's to_timestamp defaults to 1970-01-01 (probed:
            strptime('03 PM', '%I %p') → 1900-01-01 15:00:00) — shift
            the parse by -70 years when the format carries no year
            code (r13 gap probe; %j maps consistently, 1900 and 1970
            both non-leap)."""
            i, has_year = 0, False
            while i < len(fmt) - 1:
                if fmt[i] == "%":
                    c = fmt[i + 1]
                    # %c and %x are ISO composites that EMBED a year
                    if c in "YycxG":
                        has_year = True
                    i += 3 if c == "-" else 2
                else:
                    i += 1
            if has_year:
                return parse_expr
            return f"timestampadd(YEAR, -70, {parse_expr})"

        def xlate_spliced(fmt: str, operand: str) -> str:
            """date_format(op, 'pat') or, when week-number codes are
            present, concat() of pattern runs and expression segments."""
            parts = xlate_parts(fmt, allow_expr=True)
            if all(p[0] == "pat" for p in parts):
                pat = "".join(p[1] for p in parts)
                return f"date_format({operand}, {_strf_sql(pat)})"
            segs = [
                f"date_format({operand}, {_strf_sql(txt)})"
                if kind == "pat"
                else txt.replace("{d}", f"({operand})")
                for kind, txt in parts
            ]
            return f"concat({', '.join(segs)})" if len(segs) > 1 else segs[0]

        m = self._STRF_RE.search(sql)
        while m:
            close = self._find_close(sql, m.end() - 1)
            if close == -1:
                break
            args = self._split_top(sql[m.end() : close], ",")
            fn = {
                "strftime": "date_format",
                "strptime": "to_timestamp",
                # batch 18: NULL on parse failure, like DuckDB
                "try_strptime": "try_to_timestamp",
            }[m.group(1).lower()]
            fmt_arg = args[1].strip() if len(args) == 2 else ""
            # the bracket pass has already turned [..] into array(..)
            am = re.match(r"(?i)^array\s*\(", fmt_arg)
            if am and fmt_arg.endswith(")"):
                fmt_arg = "[" + fmt_arg[am.end() : -1] + "]"
            if fn != "date_format" and fmt_arg.startswith("["):
                # batch 22: strptime(s, ['%fmt1', '%fmt2', …]) tries each
                # format in order. strptime errors when NONE match (but
                # is NULL on NULL input); try_strptime yields NULL.
                # Width deviation: DuckDB's list form returns TIMESTAMPTZ
                # (displays '+00' in a UTC session) — ours stays naive,
                # same wall-time value (CAST AS TIMESTAMP for parity).
                fmts = [
                    f.strip()
                    for f in self._split_top(fmt_arg[1:-1], ",")
                    if f.strip()
                ]
                if not all(f.startswith("'") and f.endswith("'") for f in fmts):
                    raise UQueryError.sql_error(
                        "strptime: format list must be string literals"
                    )
                a0 = args[0].strip()
                tries = ", ".join(
                    year_defaulted(
                        f"try_to_timestamp({a0}, {_strf_sql(xlate(f[1:-1]))})",
                        f[1:-1],
                    )
                    for f in fmts
                )
                body = f"coalesce({tries})"
                if fn == "to_timestamp":  # strict strptime
                    body = (
                        f"(CASE WHEN ({a0}) IS NULL THEN CAST(NULL AS TIMESTAMP) "
                        f"WHEN {body} IS NOT NULL THEN {body} "
                        f"ELSE CAST(raise_error('strptime: no format matched') "
                        f"AS TIMESTAMP) END)"
                    )
                sql = sql[: m.start()] + body + sql[close + 1 :]
                m = self._STRF_RE.search(sql, m.start() + len(body))
                continue
            if len(args) == 2 and args[1].strip().startswith("'"):
                fmt = args[1].strip()[1:-1]
                a0 = args[0].strip()
                if fn == "date_format":
                    body = xlate_spliced(fmt, a0)
                else:
                    strict, lenient = xlate(fmt), xlate(fmt, lenient=True)
                    if strict == lenient:
                        body = year_defaulted(
                            f"{fn}({a0}, {_strf_sql(strict)})", fmt
                        )
                    else:
                        # strict wins when both parse (identical result);
                        # the lenient arm admits DuckDB's unpadded inputs
                        body = year_defaulted(
                            f"coalesce(try_to_timestamp({a0}, {_strf_sql(strict)}), "
                            f"try_to_timestamp({a0}, {_strf_sql(lenient)}))",
                            fmt,
                        )
                        if fn == "to_timestamp":  # strict strptime raises
                            body = (
                                f"(CASE WHEN ({a0}) IS NULL THEN CAST(NULL AS TIMESTAMP) "
                                f"WHEN {body} IS NOT NULL THEN {body} "
                                f"ELSE CAST(raise_error('strptime: input did not match format') "
                                f"AS TIMESTAMP) END)"
                            )
                sql = sql[: m.start()] + body + sql[close + 1 :]
            m = self._STRF_RE.search(sql, m.start() + len(fn))
        return sql

    # DuckDB len() is polymorphic (chars of a string / elements of a
    # list); Spark splits it into length() and size().
    _LEN_RE = re.compile(r"(?i)\blen\s*\(")

    def _rewrite_len(self, sql: str) -> str:
        """Resolve each ``len(expr)`` to ``size`` or ``length`` by type.

        Text-level rewriting can't know expr's type, so each occurrence is
        decided by a LIMIT-0 analysis probe (no execution — the same trick
        as * REPLACE): the query analyzes with this occurrence as
        ``size(expr)`` iff expr is an array. While one occurrence is being
        probed the others are neutralized as ``length(cast(expr AS
        STRING))``, which analyzes for every type. Runs LAST in the
        pipeline so the probe sees otherwise-valid Spark SQL.
        """
        if not self._LEN_RE.search(sql):
            return sql
        return self._poly_size_impl(sql, self._LEN_RE)

    _LENGTH_RE = re.compile(r"(?i)\blength\s*\(")

    def _rewrite_length_poly(self, sql: str) -> str:
        """Batch-18: DuckDB ``length()`` is polymorphic too (chars of a
        string / elements of a LIST — Spark's length rejects arrays).
        The common all-string case costs ONE analysis probe: if the
        query analyzes with every length() native, nothing changes;
        only a failing query pays the per-occurrence size-vs-length
        probes (same machinery as len())."""
        if not self._search_code(self._LENGTH_RE, sql):
            return sql
        if self._probe_analyzes(f"SELECT * FROM ({sql}) uq_lnp LIMIT 0"):
            return sql
        return self._poly_size_impl(sql, self._LENGTH_RE)

    def _poly_size_impl(self, sql: str, regex: "re.Pattern[str]") -> str:
        # split into [text0, arg0, text1, arg1, ..., textN] skipping
        # occurrences inside string literals
        segs: list[str] = []
        args: list[str] = []
        i, n = 0, len(sql)
        last = 0
        while i < n:
            c = sql[i]
            if c == "'":
                j = sql.find("'", i + 1)
                i = n if j == -1 else j + 1
                continue
            m = regex.match(sql, i)
            if m and not (i > 0 and (sql[i - 1].isalnum() or sql[i - 1] in "_.")):
                close = self._find_close(sql, m.end() - 1)
                if close == -1:
                    break
                segs.append(sql[last:i])
                args.append(sql[m.end() : close])
                last = close + 1
                i = last
                continue
            i += 1
        segs.append(sql[last:])
        if not args:
            return sql

        def compose(forms: list[str]) -> str:
            out = [segs[0]]
            for f, t in zip(forms, segs[1:]):
                out.append(f)
                out.append(t)
            return "".join(out)

        neutral = [f"length(cast(({a}) AS STRING))" for a in args]
        chosen: list[str] = []
        for k, a in enumerate(args):
            probe_forms = neutral[:k] + [f"size({a})"] + neutral[k + 1 :]
            if self._probe_analyzes(
                f"SELECT * FROM ({compose(probe_forms)}) uq_len LIMIT 0"
            ):
                chosen.append(f"size({a})")
            else:
                chosen.append(f"length({a})")
        return compose(chosen)

    # -- casts: DuckDB type names + fractional→integral rounding ----------

    _COLON_CAST_RE = re.compile(
        r"::\s*((?:[Aa][Rr][Rr][Aa][Yy]\s*<[^<>]*(?:<[^<>]*>)?[^<>]*>)|\w+)"
        r"(\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?"
    )
    _CAST_RE = re.compile(r"(?i)\b(try_)?cast\s*\(")
    # DuckDB type names Spark's parser rejects or narrows differently.
    # HUGEINT/UBIGINT → BIGINT is a documented narrowing (no int128 type);
    # unsigned types widen to the next signed Spark type.
    _TYPE_RENAMES = {
        "hugeint": "BIGINT",
        "int1": "TINYINT",
        "int2": "SMALLINT",
        "int4": "INT",
        "int8": "BIGINT",
        "signed": "BIGINT",
        "utinyint": "SMALLINT",
        "usmallint": "INT",
        "uinteger": "BIGINT",
        "ubigint": "BIGINT",
        "text": "STRING",
        "varchar": "STRING",  # bare VARCHAR (parameterized VARCHAR(n) kept)
        "bpchar": "STRING",
        "blob": "BINARY",
        "bytea": "BINARY",
        "real": "FLOAT",
        "float4": "FLOAT",
        "float8": "DOUBLE",
        "logical": "BOOLEAN",
        "uuid": "STRING",
    }
    _INTEGRAL_TYPES = {"tinyint", "smallint", "int", "integer", "bigint", "long", "short", "byte"}

    _TRAILING_LIT_RE = re.compile(r"'(?:[^']|'')*'$")

    _TRY_RE = re.compile(r"(?i)(?<![\w.])TRY\s*\(")

    def _rewrite_try_expr(self, sql: str) -> str:
        """DuckDB ≥1.2 ``TRY(expr)`` — NULL instead of an error (the
        reference pins 1.5.2; 1.0.0 lacks the form). Narrow, honest
        support: the error classes TRY actually guards map to Spark
        forms with identical NULL behavior —

        - TRY(CAST(x AS T)) / TRY(x::T) → try_cast (conversion errors);
        - TRY(strptime(s, f)) → try_strptime (parse errors);
        - TRY(ln/log/log2/log10(x)) → the bare call (Spark already
          returns NULL outside the domain where DuckDB raises);
        - TRY(sqrt(x)) → negative-domain CASE (Spark yields NaN, not
          NULL);
        - division/modulo-by-zero is already NULL in DuckDB (probed),
          so arithmetic needs no TRY translation.

        Any other inner form RAISES — a loud error, never a silent
        divergence (Spark's NaN-vs-NULL and error-vs-NULL edges differ
        per function and each needs its own probe before support).
        Each fast-path only fires when the matched call spans the
        ENTIRE inner expression (its close paren is the last char) —
        a compound inner like TRY(CAST(a AS INT) + f(b)) raises as
        unsupported instead of converting only the leading call
        (ADVICE r13; the old sqrt branch even dropped the trailing
        text of a compound inner — a silent wrong value)."""

        def _whole(pat: str, text: str):
            """Leading-call args iff the call spans all of ``text``."""
            h = self._call_args(re.compile(pat), text)
            if h and h[0].start() == 0 and h[1] == len(text) - 1:
                return h[2]
            return None

        pos = 0
        while True:
            hit = self._call_args(self._TRY_RE, sql, pos)
            if not hit:
                return sql
            m, close, args = hit
            if len(args) != 1:
                raise UQueryError.sql_error("TRY expects exactly 1 expression")
            inner = self._rewrite_try_expr(args[0]).strip()
            sqrt_args = _whole(r"(?i)^sqrt\s*\(", inner)
            if _whole(r"(?i)^cast\s*\(", inner) is not None:
                # a cast CHAIN (nested colon-casts have folded to
                # CAST(CAST(..) ..) by now) converts at EVERY level —
                # DuckDB's TRY nulls an inner conversion error too, and
                # try_cast over NULL stays NULL, so the chain matches
                cm = re.match(r"(?i)^cast\s*\(", inner)
                body = inner[cm.end() : len(inner) - 1]
                parts = self._split_top(body, "as")
                operand = " AS ".join(parts[:-1]).strip()
                # the colon-cast pass parenthesizes its operand —
                # strip balanced outer parens so the chain test sees it
                while (
                    operand.startswith("(")
                    and self._find_close(operand, 0) == len(operand) - 1
                ):
                    operand = operand[1:-1].strip()
                if len(parts) >= 2 and _whole(r"(?i)^cast\s*\(", operand) is not None:
                    operand = self._rewrite_try_expr(f"TRY({operand})")
                    repl = f"try_cast({operand} AS {parts[-1].strip()})"
                else:
                    repl = "try_" + inner
            elif _whole(r"(?i)^(?:try_)?strptime\s*\(", inner) is not None:
                repl = "try_" + inner if not inner.lower().startswith("try_") else inner
            elif _whole(r"(?i)^(ln|log|log2|log10)\s*\(", inner) is not None:
                repl = f"({inner})"
            elif sqrt_args is not None:
                if len(sqrt_args) != 1:
                    raise UQueryError.sql_error("TRY(sqrt): malformed call")
                a = sqrt_args[0]
                repl = (
                    f"(CASE WHEN ({a}) < 0 THEN CAST(NULL AS DOUBLE) "
                    f"ELSE sqrt(({a})) END)"
                )
            else:
                raise UQueryError.sql_error(
                    "TRY: unsupported expression form (supported, each "
                    "spanning the whole argument: CAST/::, strptime, "
                    "ln/log/log2/log10, sqrt; division and modulo "
                    "by zero are already NULL)"
                )
            sql = sql[: m.start()] + repl + sql[close + 1 :]
            pos = m.start() + len(repl)

    def _rewrite_colon_cast(self, sql: str) -> str:
        """DuckDB ``expr::TYPE`` → ``CAST(expr AS TYPE)`` so the CAST pass
        below applies type renames and rounding uniformly (Spark parses
        ``::`` natively, but with Spark semantics and Spark type names)."""
        m = self._search_code(self._COLON_CAST_RE, sql)
        while m:
            head = sql[: m.start()]
            lit = self._TRAILING_LIT_RE.search(head)
            if lit:  # '...'::TYPE — _take_operand doesn't scan quotes
                pre, operand = head[: lit.start()], lit.group(0)
            else:
                pre, operand = self._take_operand(head)
            ty = m.group(1) + (m.group(2) or "")
            sql = f"{pre}CAST({operand} AS {ty}){sql[m.end():]}"
            m = self._search_code(self._COLON_CAST_RE, sql)
        return sql

    def _map_type(self, ty: str) -> str:
        base = ty.strip().lower()
        if "(" in base:  # parameterized (DECIMAL(p,s), VARCHAR(n)): keep
            return ty
        return self._TYPE_RENAMES.get(base, ty)

    _UQ_POLY_RE = re.compile(r"\buq_poly\s*\(")
    _UQ_POLY_ANY_RE = re.compile(r"\buq_poly(mapi?)?\s*\(")

    def _neutralize_markers(
        self, text: str, token: str, mode: str = "null"
    ) -> str:
        """Neutralize every unresolved poly marker in a probe text: an
        ANCESTOR marker (containing the tagged occurrence) keeps the arg
        holding the token so the occurrence survives. SIBLING markers:
        mode 'null' replaces them with NULL (type-wildcard — but a
        strict context like get() then fails the probe for an UNRELATED
        reason); mode 'arg1' substitutes each sibling's conservative
        fallback form instead (list/native/scalar), which keeps the
        rest of the text well-typed; mode 'mapform' substitutes the
        map-reading form for subscript siblings — try_element_at
        analyzes for BOTH maps and arrays, so a statement holding one
        map-subscript and one array-subscript sibling doesn't veto
        every probe (round-10 battery36: the 'null' mode died on a
        field access over a NULLed sibling while 'arg1' died on the
        OTHER sibling's scalar fallback — both modes vetoed, every
        divide/cast dispatch in the statement regressed to its
        fallback). probe_ok tries all three (batch-28 temporal-fuzzer
        catch first showed a NULLed sibling silently vetoing the
        date-widening arm)."""
        while True:
            h = self._call_args(self._UQ_POLY_ANY_RE, text)
            if not h:
                return text
            hm, hclose, hargs = h
            span = text[hm.start() : hclose + 1]
            kind = hm.group(1)
            if token in span and len(hargs) in (2, 3):
                inner = next((a for a in hargs if token in a), hargs[0])
            elif mode == "null":
                inner = "NULL"
            elif mode == "mapform" and kind and len(hargs) in (2, 3):
                inner = (
                    f"filter(array(try_element_at(({hargs[0]}), {hargs[1]})), "
                    f"uq_mv -> uq_mv IS NOT NULL)"
                )
            elif kind == "mapi" and len(hargs) == 3:
                inner = hargs[2]
            elif kind == "map" and len(hargs) == 2:
                inner = f"element_at(({hargs[0]}), {hargs[1]})"
            else:
                inner = hargs[0]
            text = text[: hm.start()] + f"({inner})" + text[hclose + 1 :]

    _TIME_CAST_RE = re.compile(r"(?i)\b(try_)?cast\s*\(")

    _IVL_UNIT_WORDS = frozenset(
        "year years month months week weeks day days hour hours minute "
        "minutes second seconds millisecond milliseconds microsecond "
        "microseconds quarter quarters decade decades century centuries "
        "millennium millennia to".split()
    )
    _ATOM_RESERVED = frozenset(
        "select where when then else and or on by from having case end in "
        "not like ilike between join union intersect except all distinct "
        "as set limit offset group order is exists values row rows range "
        "preceding following unbounded over partition null true false "
        "interval".split()
    )
    _TEMPORAL_LIT_RE = re.compile(r"(?is)^(date|timestamp(?:_ntz|tz)?)\s*'")

    def _left_atom_start(self, sql: str, end: int) -> int | None:
        """Start index of the expression atom ENDING at ``end``
        (exclusive), scanning left: a parenthesized group (with optional
        function-name prefix), a string literal (with optional
        TIME/DATE/TIMESTAMP keyword prefix), or an identifier chain.
        None when no safe atom boundary exists (reserved word, operator,
        start of text) — callers then leave the site native."""
        k = end
        while k > 0 and sql[k - 1].isspace():
            k -= 1
        if k == 0:
            return None
        c = sql[k - 1]
        if c == ")":
            depth, i = 0, k - 1
            while i >= 0:
                ch = sql[i]
                if ch == "'":
                    i2 = sql.rfind("'", 0, i)
                    if i2 == -1:
                        return None
                    i = i2
                elif ch == ")":
                    depth += 1
                elif ch == "(":
                    depth -= 1
                    if depth == 0:
                        break
                i -= 1
            if i < 0 or depth != 0:
                return None
            e = i
            while e > 0 and (sql[e - 1].isalnum() or sql[e - 1] in "_$"):
                e -= 1
            if e == i:
                return i  # bare parens
            word = sql[e:i].lower()
            if word in self._ATOM_RESERVED:
                return i  # keyword before parens: atom is the parens only
            # dotted qualifier chain (db.fn(...))
            start = e
            while start > 1 and sql[start - 1] == ".":
                s2 = start - 1
                while s2 > 0 and (sql[s2 - 1].isalnum() or sql[s2 - 1] in '_$"'):
                    s2 -= 1
                if s2 == start - 1:
                    break
                start = s2
            return start
        if c == "'":
            i = sql.rfind("'", 0, k - 1)
            while i > 0 and sql[i - 1] == "'":  # doubled-quote escape
                i2 = sql.rfind("'", 0, i - 1)
                if i2 == -1:
                    return None
                i = i2
            if i == -1:
                return None
            m = re.search(
                r"(?is)\b(time|date|timestamp(?:_ntz|tz)?)\s*$", sql[:i]
            )
            return m.start(1) if m else i
        if c.isalnum() or c in '_$"`':
            start = k
            while start > 0 and (sql[start - 1].isalnum() or sql[start - 1] in '_$".`'):
                start -= 1
            word = sql[start:k].lower()
            if word in self._ATOM_RESERVED or word in self._IVL_UNIT_WORDS:
                return None
            if re.match(r"^[\d.]+$", word):
                return None
            return start
        return None

    def _floordiv_lhs_start(self, sql: str, end: int) -> int | None:
        """Start of the LEFT operand atom of a ``//`` ending at ``end``
        (exclusive) — _left_atom_start plus the operand classes floordiv
        needs that the TIME scanner rejects: numeric literals. Returns
        None when no safe boundary exists OR the preceding context is a
        window clause (OVER (spec) / OVER name / FILTER (...)), where
        the parens/name is NOT the operand — callers keep the plain
        integer-div translation there."""
        k = end
        while k > 0 and sql[k - 1].isspace():
            k -= 1
        if k == 0:
            return None
        c = sql[k - 1]
        if c.isdigit() or (c == "." and k > 1 and sql[k - 2].isdigit()):
            start = k
            while start > 0 and (sql[start - 1].isdigit() or sql[start - 1] == "."):
                start -= 1
            word = sql[start:k]
            prev = sql[start - 1] if start > 0 else ""
            if re.match(r"^(\d+\.?\d*|\.\d+)$", word) and not (
                prev.isalnum() or prev in '_$"`.'
            ):
                # scientific-notation tail (1e-5): the digits after the
                # sign are not a standalone operand
                if prev == "-" and start > 1 and sql[start - 2] in "eE":
                    return None
                return start
            # identifier ending in digits (col2) → the chain scanner
        s = self._left_atom_start(sql, end)
        if s is None:
            return None
        j = s
        while j > 0 and sql[j - 1].isspace():
            j -= 1
        e = j
        while e > 0 and (sql[e - 1].isalnum() or sql[e - 1] in "_$"):
            e -= 1
        if sql[e:j].lower() in ("over", "filter"):
            return None
        return s

    def _time_wrap_skip_atom(self, a: str) -> bool:
        """Atoms provably not TIME-typed (or interval-literal tails) skip
        the wrap marker — native arithmetic, zero probe cost. Covers the
        hot TPC-H shape ``date '1998-12-01' - interval '90' day``."""
        a = a.strip()
        low = a.lower().lstrip("(").strip()
        return bool(
            re.match(
                r"^(interval\b|make_interval\b|make_dt_interval\b|"
                r"make_ym_interval\b|null\b)",
                low,
            )
            # DATE/TIMESTAMP literals (the regex does NOT match TIME:
            # 'time' is neither 'date' nor a 'timestamp' prefix-match)
            or self._TEMPORAL_LIT_RE.match(a)
            or a.startswith("'")
        )

    def _strip_pending_interval_sites(self, text: str) -> str:
        """Delete every still-unprocessed ``± INTERVAL <lit>`` site from
        a probe text. A pending TIME ∓ year-month site does not analyze
        natively AT ALL in Spark (not just overflow — BINARY_OP_DIFF_
        TYPES), so leaving it in context would veto probes of EARLIER
        sites in the chain (timemix fuzzer catch: make_time(...) -
        INTERVAL 3 MONTH - INTERVAL 3 MONTH). Deletion is type-neutral
        for every operand class. Already-chosen replacements spell the
        interval parenthesized — ``- (INTERVAL …)`` — and are not
        matched; ``± INTERVAL lit * n`` keeps its literal (the * owns
        it, and deleting would orphan the multiplier)."""
        pos = 0
        while True:
            m = self._search_code(self._IVL_KW_RE, text, pos)
            if not m:
                return text
            j = m.end()
            if j < len(text) and text[j] == "'":
                k = text.find("'", j + 1)
                if k == -1:
                    return text
                j = k + 1
            else:
                m2 = re.match(r"[\d.]+", text[j:])
                if not m2:
                    pos = m.end()
                    continue
                j += m2.end()
            while True:
                m2 = re.match(r"\s+([A-Za-z_]+)", text[j:])
                if m2 and m2.group(1).lower() in self._IVL_UNIT_WORDS:
                    j += m2.end()
                else:
                    break
            nx = j
            while nx < len(text) and text[nx].isspace():
                nx += 1
            if nx < len(text) and text[nx] in "*/":
                pos = j
                continue
            li = m.start() - 1
            while li >= 0 and text[li].isspace():
                li -= 1
            if li >= 0 and text[li] in "+-":
                text = text[:li] + text[j:]
                pos = li
                continue
            # case-B pending site (`INTERVAL lit + atom` at expression
            # start — also natively unanalyzable for TIME atoms): drop
            # the `INTERVAL lit +` prefix, keeping the atom
            at_start = li < 0 or text[li] in "(,=<>"
            if not at_start and (text[li].isalnum() or text[li] == "_"):
                we = li + 1
                ws = we
                while ws > 0 and (text[ws - 1].isalnum() or text[ws - 1] == "_"):
                    ws -= 1
                at_start = text[ws:we].lower() in self._ATOM_RESERVED
            ri = j
            while ri < len(text) and text[ri].isspace():
                ri += 1
            if at_start and ri < len(text) and text[ri] == "+":
                text = text[: m.start()] + text[ri + 1 :]
                pos = m.start()
            else:
                pos = j

    def _probe_analyzes(self, probe_sql: str) -> bool:
        """Boolean LIMIT-0 analysis probe through the RAW py4j transport.

        Used by every probe site that needs only pass/fail (never the
        exception message). The r13 fix routed probes through
        `_jsparkSession.sql` expecting a plain Py4JJavaError — but
        pyspark's install_exception_handler() patches
        `py4j.java_gateway.get_return_value` GLOBALLY, so even the raw
        JavaMember call pays captured.convert_exception: message, query
        contexts, instanceof chains and both stack traces rebuilt over
        dozens of py4j round trips per EXPECTED failure (r14 profile:
        ~112 ms/failing probe under load, 60 of a 76 s worst-statement
        rewrite). The fix: replicate JavaMember.__call__ with the
        PRISTINE `py4j.protocol.get_return_value` (that module binding
        is never patched) — a failing probe then raises a bare
        Py4JJavaError whose Java-side detail is fetched LAZILY, so
        catching it unread costs one round trip: the analysis itself.
        Same eager parse+analysis either way (Dataset.ofRows asserts
        analyzed).

        Falls back to the public SparkSession.sql when _jsparkSession
        is absent (Spark Connect sessions have no py4j handle) — the
        probe result is identical, just slower per failure."""
        # Per-top-level-rewrite memo (thread-local, see rewrite()):
        # ~17% of a probe-heavy statement's probes repeat the exact
        # same text across dispatch sites/passes — the result cannot
        # differ within one rewrite (same session state), so re-issuing
        # the analysis is pure waste. Scoped to a single rewrite() call:
        # no staleness across DDL/view changes is possible.
        memo = getattr(_PROBE_TLS, "memo", None)
        if memo is not None:
            hit = memo.get(probe_sql)
            if hit is not None:
                return hit
        ok = self._probe_analyzes_uncached(probe_sql)
        if memo is not None:
            memo[probe_sql] = ok
        return ok

    def _probe_analyzes_uncached(self, probe_sql: str) -> bool:
        jsession = getattr(self.spark, "_jsparkSession", None)
        if jsession is None:
            try:
                with _probe_quiet():
                    self.spark.sql(probe_sql)
                return True
            except Exception:
                return False
        from py4j import protocol as _p4jp

        member = jsession.sql  # JavaMember; py4j caches it on the object
        with _probe_quiet():
            try:
                args_command, temp_args = member._build_args(probe_sql)
                command = (
                    _p4jp.CALL_COMMAND_NAME
                    + member.command_header
                    + args_command
                    + _p4jp.END_COMMAND_PART
                )
                answer = member.gateway_client.send_command(command)
                try:
                    _p4jp.get_return_value(
                        answer, member.gateway_client, member.target_id, member.name
                    )
                    return True
                finally:
                    for temp_arg in temp_args:
                        if hasattr(temp_arg, "_detach"):
                            temp_arg._detach()
            except Exception:
                return False

    def _time_wrap_probe(self, candidate_sql: str) -> bool:
        """LIMIT-0 analysis probe for the TIME-wrap dispatch. Runs AFTER
        the poly resolver, so the text is Spark-valid modulo the
        cast/len passes (the same compose contract probe_ok uses).
        Pending sibling interval sites are stripped first — see
        _strip_pending_interval_sites."""
        candidate_sql = self._strip_pending_interval_sites(candidate_sql)
        with _probe_quiet():
            return self._probe_analyzes(
                "SELECT * FROM ("
                + self._rewrite_len(self._rewrite_cast(candidate_sql))
                + ") uq_tw LIMIT 0"
            )

    def _time_wrap_choose(
        self, sql: str, start: int, end: int, a: str, op: str, ilit: str
    ) -> str:
        """Resolve one ``A ± INTERVAL`` site IMMEDIATELY (NOTES 21g
        close — DuckDB wraps TIME arithmetic past midnight; Spark
        raises DATETIME_OVERFLOW). Marker-free by design: the first
        emitted nested-uq_poly version duplicated A six times per site,
        so interval CHAINS (T - I1 - I2) grew marker count
        exponentially and overflowed the resolver's lap bound (timemix
        fuzzer catch). Dispatch, two probes max:

        1. guard ``CAST((A) AS TIMESTAMP)`` analyzes → A is TIMESTAMP/
           DATE/STRING → native arithmetic unchanged;
        2. else the wrap form (``hour(A)``) analyzes → A is TIME →
           exact DECIMAL second-of-day mod-86400 arithmetic:
           pmod(secs(A) ± delta(I), 86400) → micros → timestamp_micros
           → date_format 'HH:mm:ss.SSSSSS' → TIME (the round-8
           TIMESTAMP→TIME detour shape; session TZ is UTC). delta(I)
           is anchor-timestamp subtraction, so calendar components
           contribute whole days ≡ 0 mod 24 h — matching DuckDB's
           30-day months under the same mod;
        3. else (interval operands, exotic contexts) → native, loud.
        """
        nat = f"(({a}) {op} ({ilit}))"
        guarded = (
            f"(CASE WHEN false AND CAST(({a}) AS TIMESTAMP) IS NULL "
            f"THEN {nat} ELSE {nat} END)"
        )
        anchor = "TIMESTAMP '2000-01-01 00:00:00'"
        wrap = (
            f"CAST(date_format(timestamp_micros(CAST(pmod("
            f"CAST(hour(({a})) AS BIGINT)*3600 + minute(({a}))*60 + "
            f"extract(second FROM ({a})) {op} "
            f"(CAST({anchor} + ({ilit}) AS DECIMAL(27,6)) - "
            f"CAST({anchor} AS DECIMAL(27,6))), 86400) * 1000000 "
            f"AS BIGINT)), 'HH:mm:ss.SSSSSS') AS TIME)"
        )
        if self._time_wrap_probe(sql[:start] + f"({guarded})" + sql[end:]):
            return nat
        if self._time_wrap_probe(sql[:start] + f"({wrap})" + sql[end:]):
            return wrap
        return nat

    _IVL_KW_RE = re.compile(r"(?i)\binterval\s+")

    def _rewrite_time_interval_wrap(self, sql: str) -> str:
        """``A ± INTERVAL`` / ``INTERVAL + A`` sites become two-level
        uq_poly markers (see _time_wrap_marker) so TIME operands get
        DuckDB's mod-24h wraparound while every other operand class
        keeps native Spark arithmetic. Sites whose operand is provably
        non-TIME (date/timestamp/interval literals, strings, numbers)
        are skipped textually — no probe cost on the common shapes."""
        pos = 0
        while True:
            m = self._search_code(self._IVL_KW_RE, sql, pos)
            if not m:
                return sql
            j = m.end()
            if j < len(sql) and sql[j] == "'":
                k = sql.find("'", j + 1)
                if k == -1:
                    return sql
                j = k + 1
            else:
                m2 = re.match(r"[\d.]+", sql[j:])
                if not m2:
                    pos = m.end()
                    continue
                j += m2.end()
            while True:
                m2 = re.match(r"\s+([A-Za-z_]+)", sql[j:])
                if m2 and m2.group(1).lower() in self._IVL_UNIT_WORDS:
                    j += m2.end()
                else:
                    break
            iend = j
            ilit = sql[m.start() : iend]
            # precedence guard: `A ± INTERVAL x UNIT * n` parses as
            # A ± (I * n) — a trailing higher-precedence operator owns
            # the interval literal, so the site stays native (battery5
            # regression: DATE + INTERVAL 1 DAY * (doc_id % 400))
            nx = iend
            while nx < len(sql) and sql[nx].isspace():
                nx += 1
            if nx < len(sql) and sql[nx] in "*/":
                pos = iend
                continue
            li = m.start() - 1
            while li >= 0 and sql[li].isspace():
                li -= 1
            if li >= 0 and sql[li] in "+-":
                # case A: A ± INTERVAL
                op = sql[li]
                astart = self._left_atom_start(sql, li)
                if astart is not None:
                    a = sql[astart:li].strip()
                    if not self._time_wrap_skip_atom(a):
                        repl = self._time_wrap_choose(
                            sql, astart, iend, a, op, ilit
                        )
                        sql = sql[:astart] + repl + sql[iend:]
                        pos = astart + len(repl)
                        continue
                pos = iend
                continue
            # case B: INTERVAL + A at expression start (interval - time
            # is invalid in both engines; only + commutes)
            at_start = li < 0 or sql[li] in "(,=<>"
            if not at_start and (sql[li].isalnum() or sql[li] == "_"):
                we = li + 1
                ws = we
                while ws > 0 and (sql[ws - 1].isalnum() or sql[ws - 1] == "_"):
                    ws -= 1
                at_start = sql[ws:we].lower() in self._ATOM_RESERVED
            ri = iend
            while ri < len(sql) and sql[ri].isspace():
                ri += 1
            if at_start and ri < len(sql) and sql[ri] == "+":
                rend = self._div_rhs_end(sql, ri + 1)
                if rend is not None:
                    a = sql[ri + 1 : rend].strip()
                    # keyword-prefixed literal (TIME '01:00:00'): the
                    # atom scan stops after the keyword — extend through
                    # the adjacent string literal
                    if a.lower() in (
                        "time", "date", "timestamp", "timestamp_ntz",
                    ):
                        k2 = rend
                        while k2 < len(sql) and sql[k2].isspace():
                            k2 += 1
                        if k2 < len(sql) and sql[k2] == "'":
                            k3 = sql.find("'", k2 + 1)
                            if k3 != -1:
                                rend = k3 + 1
                                a = sql[ri + 1 : rend].strip()
                    if a and not self._time_wrap_skip_atom(a):
                        repl = self._time_wrap_choose(
                            sql, m.start(), rend, a, "+", ilit
                        )
                        sql = sql[: m.start()] + repl + sql[rend:]
                        pos = m.start() + len(repl)
                        continue
            pos = iend

    def _rewrite_time_cast(self, sql: str) -> str:
        """Round 8: ``CAST(x AS TIME)`` — native under
        spark.sql.timeType.enabled for string/time operands, but Spark
        has no TIMESTAMP→TIME cast, so that operand class takes a
        date_format('HH:mm:ss.SSSSSS') detour. Emitted as a uq_poly
        marker (fallback, preferred-native) so the late LIMIT-0 probe
        dispatches per occurrence with proper sibling neutralization —
        a compose-style probe breaks when one query holds several TIME
        casts (each slot's neutral form is itself unanalyzable)."""
        pos = 0
        while True:
            hit = self._call_args(self._TIME_CAST_RE, sql, pos)
            if not hit:
                return sql
            m, close, args = hit
            parts = self._split_top(sql[m.end() : close], "as")
            if len(parts) != 2 or parts[1].strip().lower() != "time":
                # advance past the opening only — a non-TIME cast may
                # hold a TIME cast in its operand (CAST(CAST(ts AS
                # TIME) AS VARCHAR))
                pos = m.end()
                continue
            kw = (m.group(1) or "").upper()
            # recurse into the operand FIRST: a nested TIME cast copied
            # verbatim into both arms would otherwise never be marked
            # (the linear scan skips past the replacement)
            expr = self._rewrite_time_cast(parts[0].strip())
            repl = (
                f"uq_poly({kw}CAST(date_format(({expr}), "
                f"'HH:mm:ss.SSSSSS') AS TIME), "
                f"{kw}CAST(({expr}) AS TIME))"
            )
            sql = sql[: m.start()] + repl + sql[close + 1 :]
            pos = m.start() + len(repl)

    def _rewrite_poly_subscript(self, sql: str) -> str:
        """Resolve ``uq_poly(list_form, string_form)`` markers emitted by
        _bracket_postfix: a LIMIT-0 analysis probe decides per occurrence
        whether the subscripted operand is a STRING (DuckDB subscripts
        work on both strings and lists with the same window arithmetic).
        The probe substitutes the STRING form for the occurrence under
        test and a bare NULL for every other marker — it analyzes iff
        the operand is a string AND the string result fits the
        surrounding expression. Any probe failure falls back to the list
        form (the pre-round-6 behavior). Innermost markers resolve
        first so nested subscripts compose."""
        if "uq_poly" not in sql:
            return sql
        TOKEN = "/*uq_probe_target*/"
        for _ in range(100):  # bounded: one marker resolved per lap
            hits = []
            pos = 0
            while True:
                hit = self._call_args(self._UQ_POLY_ANY_RE, sql, pos)
                if not hit:
                    break
                m, close, args = hit
                hits.append((m, close, args))
                pos = m.end()
            if not hits:
                return sql
            # Resolution order: a uq_polymapi whose OPERAND/KEY args are
            # marker-free resolves first — its third arg (the list/
            # string fallback marker) must not resolve before map-ness
            # is decided (batch 28). Otherwise: innermost marker of any
            # kind (args contain no nested marker).
            target = next(
                (
                    h
                    for h in hits
                    if h[0].group(1) == "mapi"
                    and "uq_poly" not in h[2][0]
                    and "uq_poly" not in h[2][1]
                ),
                None,
            ) or next(
                (h for h in hits if all("uq_poly" not in a for a in h[2])),
                hits[-1],
            )
            m, close, args = target

            def probe_ok(cand: str) -> bool:
                tagged = sql[: m.start()] + f"({TOKEN}({cand}))" + sql[close + 1 :]
                for mode in ("null", "arg1", "mapform"):
                    probe = self._neutralize_markers(tagged, TOKEN, mode)
                    # pending TIME ∓ year-month interval sites (fixed by
                    # the LATER wraparound pass) do not analyze natively
                    # and would veto every sibling probe — strip them,
                    # type-neutral (round-9 timemix fuzzer catch)
                    probe = self._strip_pending_interval_sites(probe)
                    with _probe_quiet():
                        if self._probe_analyzes(
                            f"SELECT * FROM ({self._rewrite_len(self._rewrite_cast(probe))}) uq_ps LIMIT 0"
                        ):
                            return True
                return False

            if m.group(1) == "mapi":
                # uq_polymapi(op, key, fallback) — integer-key map
                # probe (batch 28): map_keys() analyzes only for maps
                if len(args) != 3:
                    raise UQueryError.sql_error("internal: malformed uq_polymapi")
                op, key, fallback = args
                guard = f"map_keys(({op}))"
                if probe_ok(f"IF(({guard}) IS NULL, NULL, NULL)") or probe_ok(
                    f"IF(({guard}) IS NULL, array(1), array(1))"
                ):
                    chosen = (
                        f"filter(array(try_element_at(({op}), {key})), "
                        f"uq_mv -> uq_mv IS NOT NULL)"
                    )
                else:
                    chosen = fallback  # the uq_poly pair resolves next lap
                sql = sql[: m.start()] + f"({chosen})" + sql[close + 1 :]
                continue
            if len(args) != 2:
                raise UQueryError.sql_error("internal: malformed uq_poly marker")
            if m.group(1):  # uq_polymap(operand, 'key') — batch 25
                op, key = args
                # MAP reading first (string-keyed try_element_at
                # analyzes only for maps): DuckDB's m['k'] single-
                # element LIST; then the STRUCT field reading; scalar
                # element_at stays the fallback (pre-batch-25 shape).
                mapform = (
                    f"filter(array(try_element_at(({op}), {key})), "
                    f"uq_mv -> uq_mv IS NOT NULL)"
                )
                raw_key = (self._lit_parse(key.strip()) or "").replace("`", "``")
                structform = f"(({op})).`{raw_key}`"
                chosen = f"element_at(({op}), {key})"
                for cand in (mapform, structform):
                    # CONTEXT-NEUTRAL probe: the dispatch is on the
                    # operand's TYPE, not the surrounding fit (the same
                    # subscript text sits in BOTH args of an ancestor
                    # uq_poly, whose string-form context would veto the
                    # correct map reading). The wrapper forces the
                    # candidate to analyze while presenting a neutral
                    # value to the ancestor — no single neutral type
                    # fits every context (get() is array-strict,
                    # upper() rejects arrays), so the candidate is
                    # accepted if EITHER the NULL or the array wrapper
                    # analyzes. A context rejecting both falls through
                    # to the scalar fallback (pre-batch-25 behavior).
                    if probe_ok(f"IF(({cand}) IS NULL, NULL, NULL)") or probe_ok(
                        f"IF(({cand}) IS NULL, array(1), array(1))"
                    ):
                        chosen = cand
                        break
            else:  # uq_poly(list_form, string_form)
                lst, st = args
                chosen = st if probe_ok(st) else lst
            sql = sql[: m.start()] + f"({chosen})" + sql[close + 1 :]
        return sql

    def _rewrite_cast(self, sql: str) -> str:
        """CAST/TRY_CAST parity: map DuckDB type names Spark rejects, and
        match DuckDB's fractional→integral rounding (half away from zero)
        where Spark truncates — CAST(2.5 AS BIGINT) is 3 in DuckDB, 2 in
        Spark, and Spark's round() is half-away, so the cast becomes
        CAST(round(e) AS BIGINT) exactly when e is fractional. The operand
        type comes from a LIMIT-0 analysis probe (no execution): under
        ANSI coercion ``(e) & 1`` analyzes for integral and string
        operands but not fractional ones, and ``abs(e)`` separates
        fractional from boolean. String operands stay untouched — both
        engines reject CAST('2.5' AS BIGINT) and accept '12'."""
        # collect top-level CAST occurrences as (text-segment, expr, type)
        segs: list[str] = []
        occ: list[tuple[str, str, str]] = []  # (try_kw, expr, mapped_type)
        i, n = 0, len(sql)
        last = 0
        while i < n:
            if sql[i] == "'":
                j = sql.find("'", i + 1)
                i = n if j == -1 else j + 1
                continue
            m = self._CAST_RE.match(sql, i)
            if m and not (i > 0 and (sql[i - 1].isalnum() or sql[i - 1] in "_.")):
                close = self._find_close(sql, m.end() - 1)
                if close == -1:
                    break
                parts = self._split_top(sql[m.end() : close], "as")
                if len(parts) == 2:
                    segs.append(sql[last:i])
                    occ.append((m.group(1) or "", parts[0].strip(), self._map_type(parts[1])))
                    last = close + 1
                    i = last
                    continue
            i += 1
        segs.append(sql[last:])
        if not occ:
            return sql

        def form(k: int, expr: str) -> str:
            kw, _, ty = occ[k]
            # recurse: a CAST nested inside another cast's operand (e.g.
            # concat-generated CAST(CAST(x AS VARCHAR) AS STRING)) needs
            # its OWN type-name mapping — the linear scan skipped it
            return f"{kw.upper()}CAST({self._rewrite_cast(expr)} AS {ty.strip()})"

        def compose(forms: list[str]) -> str:
            out = [segs[0]]
            for f, t in zip(forms, segs[1:]):
                out.append(f)
                out.append(t)
            return "".join(out)

        neutral = [form(k, e) for k, (_, e, _) in enumerate(occ)]
        chosen: list[str] = []
        for k, (kw, expr, ty) in enumerate(occ):
            tybase = ty.strip().lower()
            if tybase == "timetz":
                raise UQueryError.sql_error("TIMETZ is not supported")
            if tybase not in self._INTEGRAL_TYPES:
                chosen.append(neutral[k])
                continue
            # Statically classifiable operands skip the two analysis
            # probes (each a py4j spark.sql round-trip, ~60 ms — an
            # emitted inline relation can carry hundreds of NULL/integer
            # casts, measured 26 s of probe time on the
            # information_schema battery). Same outcomes the probes
            # produce: NULL, integer and single-quoted string literals
            # are non-fractional → neutral; a fractional numeric literal
            # rounds (DuckDB CAST(2.5 AS BIGINT) = 3).
            e = expr.strip()
            if (
                re.fullmatch(r"(?i)null", e)
                or re.fullmatch(r"[+-]?\d+", e)
                or (len(e) >= 2 and e[0] == "'" and e[-1] == "'" and "'" not in e[1:-1])
            ):
                chosen.append(neutral[k])
                continue
            if re.fullmatch(r"[+-]?(?:\d+\.\d*|\.\d+)(?:[eE][+-]?\d+)?", e):
                chosen.append(form(k, f"round({expr})"))
                continue

            # Probe-statement construction (the rewriter is composing a
            # LIMIT-0 probe for a DIFFERENT dispatch — thread-local
            # _probe_quiet marks exactly those regions): the rounding
            # classification is irrelevant to whether the probe ANALYZES
            # (round(e) and e are analyzable for exactly the same
            # operand types), and the resolved statement still gets the
            # full classification on its final _rewrite_cast pass. The
            # nested probes were the dominant rewrite cost on
            # battery-sized statements: every poly-subscript probe_ok
            # re-ran 2 analysis probes per cast site (b36_maplist:
            # 246 probes, 29.5 s of a 29.8 s rewrite).
            if getattr(_PROBE_TLS, "quiet", False):
                chosen.append(neutral[k])
                continue

            def analyzes(probe_expr: str) -> bool:
                forms = neutral[:k] + [probe_expr] + neutral[k + 1 :]
                with _probe_quiet():
                    return self._probe_analyzes(
                        f"SELECT * FROM ({self._rewrite_len(compose(forms))}) uq_cast LIMIT 0"
                    )

            if not analyzes(f"(({expr}) & 1)") and analyzes(f"abs({expr})"):
                chosen.append(form(k, f"round({expr})"))  # fractional operand
            else:
                chosen.append(neutral[k])
        return compose(chosen)

    def _rewrite_qualify(self, sql: str) -> str:
        """DuckDB QUALIFY → filtered subquery (Spark has no QUALIFY).

        SELECT <list> FROM ... QUALIFY <pred> [ORDER BY/LIMIT tail]
        becomes
        SELECT * EXCEPT (uq_qualify) FROM
          (SELECT <list>, (<pred>) AS uq_qualify FROM ...) WHERE uq_qualify
        [tail].  The window predicate evaluates in the subquery where its
        partition columns are still in scope; any CTE prefix stays outside.
        Applies to the final top-level SELECT (the only place the gateway's
        one-statement contract allows QUALIFY).
        """
        hits = list(self._scan_top_level(sql, {"qualify", "select", "from", "order", "limit"}))
        q = next((h for h in hits if h[2] == "qualify"), None)
        if q is None:
            return sql
        sel = max(h for h in hits if h[2] == "select" and h[0] < q[0])
        frm = min(h for h in hits if h[2] == "from" and sel[0] < h[0] < q[0])
        tail = next((h for h in hits if h[2] in ("order", "limit") and h[0] > q[0]), None)
        pred_end = tail[0] if tail else len(sql)
        pred = sql[q[1] : pred_end].strip()
        return (
            sql[: sel[0]]
            + "SELECT * EXCEPT (uq_qualify) FROM ("
            + sql[sel[0] : frm[0]]
            + f", ({pred}) AS uq_qualify "
            + sql[frm[0] : q[0]]
            + ") WHERE uq_qualify "
            + sql[pred_end:]
        )

    # -- SUMMARIZE ----------------------------------------------------------

    # DataType.simpleString() names: int->"int", long->"bigint", etc.
    _NUMERIC_TYPES = ("tinyint", "smallint", "int", "bigint", "float", "double", "decimal")

    def _rewrite_summarize(self, sql: str) -> str:
        """DuckDB ``SUMMARIZE <table|'path'|(subquery)>`` → one-scan stats.

        Emits one row per column (column_name, column_type, min, max,
        approx_unique, avg, std, q25, q50, q75, count, null_percentage —
        DuckDB's SUMMARIZE shape). All per-column aggregates compute in a
        single aggregate over one scan, then unpivot via stack(); numeric
        stats are NULL for non-numeric columns, min/max cast to string so
        the row type is uniform.
        """
        m = re.match(r"(?is)^\s*summarize\s+(.+?)\s*;?\s*$", sql)
        if m is None:
            return sql
        target = m.group(1).strip()
        if not target.startswith("("):
            target = f"(SELECT * FROM {target})"
        # resolve quoted paths / read_* TVFs inside the target up front —
        # the schema probe below needs runnable Spark SQL
        target = self._rewrite_path_tables(self._rewrite_tvfs(target))
        schema = self.spark.sql(f"SELECT * FROM {target} t LIMIT 0").schema
        aggs: list[str] = ["count(*) AS uq_n"]
        cells: list[str] = []
        for i, f in enumerate(schema.fields):
            c, t = f.name, f.dataType.simpleString()
            numeric = t.startswith(self._NUMERIC_TYPES)
            orderable = not (t.startswith(("map<", "array<", "struct<")))
            aggs.append(
                f"CAST(min(`{c}`) AS STRING) AS uq_min_{i}"
                if orderable
                else f"CAST(NULL AS STRING) AS uq_min_{i}"
            )
            aggs.append(
                f"CAST(max(`{c}`) AS STRING) AS uq_max_{i}"
                if orderable
                else f"CAST(NULL AS STRING) AS uq_max_{i}"
            )
            aggs.append(f"approx_count_distinct(`{c}`) AS uq_au_{i}")
            if numeric:
                aggs.append(f"CAST(avg(`{c}`) AS DOUBLE) AS uq_avg_{i}")
                aggs.append(f"CAST(stddev(`{c}`) AS DOUBLE) AS uq_std_{i}")
                for q in (25, 50, 75):
                    aggs.append(
                        f"CAST(approx_percentile(`{c}`, 0.{q}) AS DOUBLE) AS uq_q{q}_{i}"
                    )
            else:
                aggs.append(f"CAST(NULL AS DOUBLE) AS uq_avg_{i}")
                aggs.append(f"CAST(NULL AS DOUBLE) AS uq_std_{i}")
                for q in (25, 50, 75):
                    aggs.append(f"CAST(NULL AS DOUBLE) AS uq_q{q}_{i}")
            aggs.append(f"count(`{c}`) AS uq_cnt_{i}")
            cells.append(
                f"'{c}', '{t}', uq_min_{i}, uq_max_{i}, uq_au_{i}, uq_avg_{i}, "
                f"uq_std_{i}, uq_q25_{i}, uq_q50_{i}, uq_q75_{i}, uq_n, "
                f"round(100.0 * (uq_n - uq_cnt_{i}) / uq_n, 2)"
            )
        n = len(schema.fields)
        stack = (
            f"stack({n}, {', '.join(cells)}) AS (column_name, column_type, min, max, "
            "approx_unique, avg, std, q25, q50, q75, count, null_percentage)"
        )
        return f"SELECT {stack} FROM (SELECT {', '.join(aggs)} FROM {target} t)"

    # -- macros -------------------------------------------------------------

    def add_scalar_macro(self, name: str, params: list[str], body: str) -> None:
        """Register a textual macro: name(args) inlines to body with args
        substituted — DuckDB macro semantics (inlined at bind, not called)."""
        self._macros[name.lower()] = (params, body)

    def add_table_macro(self, name: str) -> None:
        """Register a parameterless table macro: FROM name() → FROM name."""
        self._table_macros.add(name.lower())

    @staticmethod
    def _sub_params_outside_literals(param: str, repl: str, body: str) -> str:
        """Whole-word substitution of a macro parameter, skipping
        single-quoted literals (DuckDB escape space: '' is an escaped
        quote, so adjacent literal segments merge into one)."""
        pat = re.compile(rf"(?i)\b{re.escape(param)}\b")
        out: list[str] = []
        i, n = 0, len(body)
        seg_start = 0
        while i < n:
            if body[i] == "'":
                out.append(pat.sub(repl, body[seg_start:i]))
                j = i + 1
                while j < n:
                    j = body.find("'", j)
                    if j == -1:
                        j = n
                        break
                    if j + 1 < n and body[j + 1] == "'":
                        j += 2
                        continue
                    j += 1
                    break
                out.append(body[i:j])
                i = seg_start = j
            else:
                i += 1
        out.append(pat.sub(repl, body[seg_start:]))
        return "".join(out)

    @staticmethod
    def _split_args(raw: str) -> list[str]:
        # Brackets and braces nest too: a macro arg may be a DuckDB
        # list literal [1, 2] or MAP {'a': 1} whose commas must not
        # split (round 11 — early expansion now sees raw bracket
        # syntax; the old tail position ran after the bracket passes
        # had rewritten them to parenthesized calls, masking this).
        args, depth, start = [], 0, 0
        i = 0
        while i < len(raw):
            c = raw[i]
            if c in "([{":
                depth += 1
            elif c in ")]}":
                depth -= 1
            elif c == "'":
                i = raw.index("'", i + 1)
            elif c == "," and depth == 0:
                args.append(raw[start:i].strip())
                start = i + 1
            i += 1
        tail = raw[start:].strip()
        if tail:
            args.append(tail)
        return args

    def _expand_macros(self, sql: str) -> str:
        """Balanced-paren expansion of registered scalar + table macros,
        iterated to a fixpoint so macros may nest (bounded to catch cycles).

        Runs FIRST in the pipeline (round 11): DuckDB inlines macros at
        bind time and user macros SHADOW built-in names (probed: CREATE
        MACRO mod(a) AS a + 1; SELECT mod(3) → 4), so no name-keyed
        rewrite pass may ever see a macro call — the round-10 alias
        passes (mod/add/divide/…) running before expansion silently
        replaced 2-arg macros with the arithmetic operator. Early
        expansion also means macro BODIES (raw DuckDB dialect from a
        .db attach, main.rs:414-419) get the full translation pipeline;
        the old tail position inserted them after nearly every pass.
        Searches skip string literals (_search_code)."""
        if self._table_macros:
            names = "|".join(re.escape(n) for n in self._table_macros)
            sql = self._sub_code_fn(
                re.compile(rf"(?i)\b({names})\s*\(\s*\)"),
                lambda m: m.group(1),
                sql,
            )
        for _ in range(10):
            changed = False
            for name, (params, body) in self._macros.items():
                pat = re.compile(rf"(?i)\b{re.escape(name)}\s*\(")
                m = self._search_code(pat, sql)
                while m:
                    depth, i = 1, m.end()
                    while i < len(sql) and depth:
                        if sql[i] == "'":
                            i = sql.index("'", i + 1)
                        depth += {"(": 1, ")": -1}.get(sql[i], 0)
                        i += 1
                    args = self._split_args(sql[m.end() : i - 1])
                    if len(args) != len(params):
                        raise UQueryError.sql_error(
                            f"macro {name} expects {len(params)} args, got {len(args)}"
                        )
                    expansion = body
                    for p, a in zip(params, args):
                        # substitute OUTSIDE string literals only: a
                        # param named 's' must not rewrite the s in
                        # ' it''s' (DuckDB substitutes at the AST,
                        # never inside literals — round-11 catch,
                        # exposed by early expansion)
                        expansion = self._sub_params_outside_literals(
                            p, f"({a})", expansion
                        )
                    sql = sql[: m.start()] + f"({expansion})" + sql[i:]
                    changed = True
                    m = self._search_code(pat, sql)
            if not changed:
                return sql
        return sql

    def _substitute_prepared_params(self, text: str, args: list[str]) -> str:
        """$n / ? placeholder substitution OUTSIDE string literals,
        DuckDB-probed semantics: $1 repeats fine, arbitrary order,
        '$1' inside a literal is text; a `?` takes (highest parameter
        index seen so far) + 1 scanning left-to-right ($1 + ? binds ?
        to $2; ? + $1 binds ? to $1 — probed both); binding is
        positional, so the referenced index set must be exactly
        {1..len(args)} or DuckDB errors with a count mismatch."""
        out: list[str] = []
        i, n = 0, len(text)
        seg_start = 0
        max_seen = 0
        used = set()

        def sub_code(seg: str) -> str:
            nonlocal max_seen
            res: list[str] = []
            j = 0
            while j < len(seg):
                c = seg[j]
                if c == "$" and j + 1 < len(seg) and seg[j + 1].isdigit():
                    k = j + 1
                    while k < len(seg) and seg[k].isdigit():
                        k += 1
                    idx = int(seg[j + 1 : k])
                    if idx < 1 or idx > len(args):
                        raise UQueryError.sql_error(
                            "Parameter argument/count mismatch"
                        )
                    used.add(idx)
                    max_seen = max(max_seen, idx)
                    res.append(f"({args[idx - 1]})")
                    j = k
                elif c == "?":
                    idx = max_seen + 1
                    if idx > len(args):
                        raise UQueryError.sql_error(
                            "Parameter argument/count mismatch"
                        )
                    used.add(idx)
                    max_seen = idx
                    res.append(f"({args[idx - 1]})")
                    j += 1
                else:
                    res.append(c)
                    j += 1
            return "".join(res)

        while i < n:
            if text[i] == "'":
                out.append(sub_code(text[seg_start:i]))
                j = i + 1
                while j < n:
                    j = text.find("'", j)
                    if j == -1:
                        j = n
                        break
                    if j + 1 < n and text[j + 1] == "'":
                        j += 2
                        continue
                    j += 1
                    break
                out.append(text[i:j])
                i = seg_start = j
            else:
                i += 1
        out.append(sub_code(text[seg_start:]))
        if used != set(range(1, len(args) + 1)):
            raise UQueryError.sql_error("Parameter argument/count mismatch")
        return "".join(out)

    _REC_CTE_RE = re.compile(
        r"(?is)^\s*WITH\s+RECURSIVE\s+(\w+)\s*(?:\(([^)]*)\))?\s*AS\s*\("
    )

    def _rewrite_recursive_union(self, sql: str) -> str:
        """``WITH RECURSIVE t AS (seed UNION step)`` — the DISTINCT
        form, whose termination depends on each iteration contributing
        only UNSEEN rows (graph reachability, cycle-safe transitive
        closure). Spark's native recursive CTE rejects it outright
        (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE; the UNION ALL form
        stays native — r13 shape probe). Evaluated here by driver-side
        SEMI-NAIVE iteration, the standard datalog strategy: the step
        is applied to the previous DELTA only (bound as a temp view),
        new rows = step(delta) − total, stop when the delta is empty.
        Each iteration is one distributed Spark job over the delta —
        lineage is cut per round with localCheckpoint so deep
        recursions keep constant-size plans. Iteration cap 200
        (documented; DuckDB itself would run a non-terminating
        recursion forever). The materialized fixpoint replaces the
        CTE body; the rest of the statement is untouched."""
        m = self._REC_CTE_RE.match(sql)
        if not m:
            return sql
        close = self._find_close(sql, m.end() - 1)
        if close == -1:
            return sql
        body = sql[m.end() : close]
        parts = self._split_top(body, "union")
        if len(parts) != 2 or re.match(r"(?is)^\s*all\b", parts[1]):
            return sql  # UNION ALL (or no union): Spark-native path
        name = m.group(1)
        cols = [c.strip() for c in (m.group(2) or "").split(",") if c.strip()]
        seed_sql, step_sql = parts[0].strip(), parts[1].strip()
        # uuid, not an instance counter: the engine shares one rewriter
        # per session across FAIR-pool concurrent requests, and two
        # interleaved recursive queries must never collide on the
        # delta/fixpoint temp-view names
        import uuid

        uid = f"uq_rec_{uuid.uuid4().hex[:12]}"
        step_bound = self._sub_code_fn(
            re.compile(rf"(?i)(?<![\w.]){re.escape(name)}(?![\w.])"),
            lambda _m: f"{uid}_delta",
            step_sql,
        )
        seed_df = self.spark.sql(self.rewrite(seed_sql)).distinct()
        if cols:
            seed_df = seed_df.toDF(*cols)
        step_rewritten = self.rewrite(step_bound)
        total = seed_df.localCheckpoint(eager=True)
        delta = total
        for _ in range(200):
            if delta.limit(1).count() == 0:
                break
            delta.createOrReplaceTempView(f"{uid}_delta")
            new = self.spark.sql(step_rewritten)
            if cols:
                new = new.toDF(*cols)
            delta = new.distinct().subtract(total).localCheckpoint(eager=True)
            total = total.union(delta).localCheckpoint(eager=True)
        else:
            raise UQueryError.sql_error(
                "recursive CTE (UNION form) exceeded 200 iterations"
            )
        self.spark.catalog.dropTempView(f"{uid}_delta")
        total.createOrReplaceTempView(uid)
        rest = sql[close + 1 :]
        return self.rewrite(f"WITH RECURSIVE {name} AS (SELECT * FROM {uid}){rest}")

    def rewrite(self, sql: str) -> str:
        # Open a probe-result memo for the duration of this TOP-LEVEL
        # rewrite (thread-local; nested rewrite() calls — EXECUTE,
        # macro/CTE recursion — share the outer one, which is sound:
        # session state cannot change mid-rewrite).
        if getattr(_PROBE_TLS, "memo", None) is None:
            _PROBE_TLS.memo = {}
            try:
                return self._rewrite_inner(sql)
            finally:
                _PROBE_TLS.memo = None
        return self._rewrite_inner(sql)

    def _rewrite_inner(self, sql: str) -> str:
        if _FORBIDDEN_RE.match(sql):
            raise UQueryError.sql_error(
                "session-mutating statements are disabled (configuration is locked)"
            )
        # PREPARE / EXECUTE / DEALLOCATE — DuckDB prepared statements
        # (round 11; probed: redefinition allowed, DEALLOCATE of a
        # missing name is a silent no-op, EXECUTE of a missing name
        # errors, $n repeats/reorders, '$1' inside literals is text,
        # strict argument-count match). The statement TEXT is stored
        # raw and the full pipeline runs at EXECUTE time, so prepared
        # statements see current views/macros like DuckDB's binder.
        m = _PREPARE_RE.match(sql)
        if m:
            if not hasattr(self, "_prepared"):
                self._prepared = {}
            self._prepared[m.group(1).lower()] = m.group(2)
            return "SELECT 1 AS ok WHERE false"
        m = _EXECUTE_RE.match(sql)
        if m:
            name = m.group(1).lower()
            stmts = getattr(self, "_prepared", {})
            if name not in stmts:
                raise UQueryError.sql_error(
                    f'Prepared statement "{m.group(1)}" does not exist'
                )
            args = self._split_args(m.group(2)) if m.group(2) else []
            # Depth guard (ADVICE r12): a self-referential statement
            # (PREPARE a AS EXECUTE a($1); EXECUTE a(1)) otherwise
            # recurses until an uncaught RecursionError — bound it like
            # the macro fixpoint's loop and raise the 400-contract
            # error instead.
            depth = getattr(self, "_execute_depth", 0)
            if depth >= 16:
                raise UQueryError.sql_error(
                    f'EXECUTE recursion limit exceeded expanding "{m.group(1)}" '
                    "(self-referential prepared statement?)"
                )
            self._execute_depth = depth + 1
            try:
                return self.rewrite(
                    self._substitute_prepared_params(stmts[name], args)
                )
            finally:
                self._execute_depth = depth
        m = _DEALLOCATE_RE.match(sql)
        if m:
            getattr(self, "_prepared", {}).pop(m.group(1).lower(), None)
            return "SELECT 1 AS ok WHERE false"
        # batch-26 session DDL first: CREATE VIEW/TABLE bodies recurse
        # through the full pipeline, DML raises
        if re.match(r"(?is)^\s*(create|drop|insert|update|delete|merge|truncate)\b", sql):
            return self._rewrite_session_ddl(sql)
        # batch-28 statement normalizations: DuckDB's EXPLAIN ANALYZE
        # profiles at runtime — Spark's closest is the plain plan
        # (documented: no runtime profile); SHOW ALL TABLES lists the
        # same set as SHOW TABLES here (single in-memory schema)
        sql = re.sub(r"(?is)^\s*explain\s+analyze\b", "EXPLAIN", sql)
        sql = re.sub(r"(?is)^\s*show\s+all\s+tables\b", "SHOW TABLES", sql)
        # macros FIRST — DuckDB inlines at bind and user macros shadow
        # every built-in name (round-10 regression: the operator-alias
        # pass saw a 2-arg macro named `mod` first and emitted `%` —
        # silent wrong value); bodies are raw DuckDB dialect and need
        # the full pipeline below anyway.
        sql = self._expand_macros(sql)
        sql = self._rewrite_summarize(sql)
        sql = self._rewrite_from_first(sql)
        sql = self._rewrite_recursive_union(sql)
        # batch-24: standard FETCH FIRST / OFFSET n ROWS → LIMIT/OFFSET
        sql = self._rewrite_fetch_first(sql)
        sql = self._rewrite_tvfs(sql)
        sql = self._rewrite_glob_tvf(sql)
        sql = self._rewrite_information_schema(sql)
        sql = self._rewrite_pivot_statement(sql)
        sql = self._rewrite_unpivot_statement(sql)
        # batch-18: standard TRIM(... FROM 'lit') BEFORE path tables —
        # the quoted operand after FROM would read as a path table
        sql = self._rewrite_trim_std(sql)
        sql = self._rewrite_path_tables(sql)
        # literal escape space first: user literals are DuckDB (escape-
        # free); every pass below emits literals in Spark escape space
        sql = self._normalize_literals(sql)
        # Spark's typed literals require 4-digit years; DuckDB accepts
        # DATE '999-06-01' (round-11 wave-6 probe — the whole family
        # errored loudly). Zero-pad the year. BC years (DuckDB
        # '(-infinity)'/negative) stay untouched: loud, not silent.
        sql = self._sub_code_fn(
            re.compile(
                r"(?i)\b(date|timestamp(?:_ntz)?|timestamptz)(\s*')(\d{1,3})-"
            ),
            lambda m: f"{m.group(1)}{m.group(2)}{int(m.group(3)):04d}-",
            sql,
        )
        # DuckDB array-type suffix — CAST(x AS DOUBLE[]) / x::FLOAT[2] —
        # BEFORE the bracket pass, which would otherwise read `TYPE[]`
        # as a subscript on an identifier and mangle the cast (round-11
        # wave-9 catch: every spelling was a loud parse error). Fixed
        # sizes drop (Spark has no fixed-length arrays — same values,
        # documented); inner DuckDB type names map here so the late
        # cast pass never needs to descend into ARRAY<…>.
        def _arr_ty(m):
            ty = self._map_type(m.group(2).strip())
            for _ in range(m.group(3).count("[")):
                ty = f"ARRAY<{ty}>"
            return m.group(1) + ty

        sql = self._sub_code_fn(
            re.compile(
                r"(?i)(\bas\s+|::\s*)"
                r"([a-z_]\w*(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)"
                r"((?:\s*\[\s*\d*\s*\])+)"
            ),
            _arr_ty,
            sql,
        )
        sql = self._raise_unsupported(sql)
        sql = self._rewrite_json_arrows(sql)
        # DuckDB ≥1.3 python-style lambda — `lambda x, y: expr` is the
        # NEW preferred syntax (docs deprecate `x -> expr`; the
        # reference pins 1.5.2) → normalize to the arrow form the rest
        # of the pipeline and Spark parse. Before the map-literal pass
        # only for tidiness — the `lambda` keyword makes the colon
        # unambiguous. Code-only scan: 'lambda' inside string literals
        # stays text.
        sql = self._sub_code_fn(
            self._PY_LAMBDA_RE,
            lambda m: (
                m.group(1)
                if "," not in m.group(1)
                else "(" + ", ".join(p.strip() for p in m.group(1).split(",")) + ")"
            )
            + " -> ",
            sql,
        )
        # MAP {} before brackets: a subscript on a map literal must see a
        # ')'-terminated operand to read as postfix.
        sql = self._rewrite_map_literal(sql)
        # batch-23: DuckDB element_at is the MAP accessor (returns a
        # single-element LIST, [] when missing) — exactly map_extract.
        # Must run before the bracket pass, whose step-slice output emits
        # Spark's own element_at().
        sql = self._sub_code(
            re.compile(r"(?i)\belement_at\s*\("), "map_extract(", sql
        )
        # bare struct literals AFTER map literals: `MAP {…}` must be
        # consumed first or the lookbehind would read it as a struct.
        sql = self._rewrite_struct_literal(sql)
        # batch-24: array_slice(l, a, b[, step]) is the function spelling
        # of the bracket slice — convert BEFORE the bracket pass so
        # negatives/steps/string-poly all ride the same machinery
        sql = self._rewrite_array_slice_fn(sql)
        # list-typed date_part and tuple entries need the [...] / (…,…)
        # source text — before the bracket pass consumes it
        sql = self._rewrite_date_part_list(sql)
        sql = self._rewrite_map_entries_tuples(sql)
        sql = self._rewrite_bracket_syntax(sql)
        # batch-25: dot-chaining x.f(a) → f(x, a) AFTER brackets (list
        # literals are array(...) calls by now) and BEFORE renames
        sql = self._rewrite_dot_chain(sql)
        # batch-28: DuckDB reverse() is GRAPHEME-aware and string-only
        # (list reversal is list_reverse); intercept user calls here —
        # later passes emit Spark's native reverse for lists, and the
        # bracket pass's step-slice emission used the sentinel above
        if self._search_code(re.compile(r"(?i)(?<![\w.])reverse\s*\("), sql):
            from .functions.parity_udfs import register_parity_udfs

            register_parity_udfs(self.spark)
            sql = self._sub_code(
                re.compile(r"(?i)(?<![\w.])reverse\s*\("),
                "uq_reverse_graphemes(",
                sql,
            )
        # restore the bracket pass's sentinel (list reversal is native)
        sql = self._sub_code(
            re.compile(r"\buq_native_reverse\s*\("), "reverse(", sql
        )
        # batch-28 unicode matrix: DuckDB cases via utf8proc's SIMPLE
        # 1:1 mapping (upper('straße')='STRAẞE', no full/context maps)
        # and its string distances run on UTF-8 BYTES. ASCII input —
        # detected by length = octet_length — keeps the native JVM
        # fast path; only non-ASCII rows pay the parity UDF.
        for name, native, udf, nargs in (
            ("upper", "upper", "uq_upper_simple", 1),
            ("ucase", "upper", "uq_upper_simple", 1),
            ("lower", "lower", "uq_lower_simple", 1),
            ("lcase", "lower", "uq_lower_simple", 1),
            ("levenshtein", "levenshtein", "uq_lev_bytes", 2),
            ("editdist3", "levenshtein", "uq_lev_bytes", 2),
        ):
            pat = re.compile(rf"(?i)(?<![\w.]){name}\s*\(")
            pos2 = 0
            while True:
                hit = self._call_args(pat, sql, pos2)
                if not hit:
                    break
                m2, close2, args2 = hit
                if len(args2) != nargs:
                    pos2 = close2 + 1
                    continue
                from .functions.parity_udfs import register_parity_udfs

                register_parity_udfs(self.spark)
                ascii_guard = " AND ".join(
                    f"length(({a})) = octet_length(({a}))" for a in args2
                )
                argtext = ", ".join(f"({a})" for a in args2)
                hybrid = (
                    f"CASE WHEN {ascii_guard} THEN {native}({argtext}) "
                    f"ELSE {udf}({argtext}) END"
                )
                # uq_poly: a Python UDF can't sit inside a higher-order
                # lambda — there the probe falls back to the native JVM
                # form (residual deviation: non-ASCII casing INSIDE
                # lambdas keeps full-map semantics; documented)
                repl = f"uq_poly({native}({argtext}), {hybrid})"
                sql = sql[: m2.start()] + repl + sql[close2 + 1 :]
                pos2 = m2.start() + len(repl)
        # batch-28: timezone_hour/minute are 0 for naive timestamps
        # (UTC session — DuckDB-verified), NULL-propagating
        for tzfn in ("timezone_hour", "timezone_minute"):
            while True:
                hit = self._call_args(
                    re.compile(rf"(?i)\b{tzfn}\s*\("), sql
                )
                if not hit:
                    break
                m, close, args = hit
                if len(args) != 1:
                    raise UQueryError.sql_error(f"{tzfn} expects 1 arg")
                repl = (
                    f"(CASE WHEN CAST(({args[0]}) AS TIMESTAMP) IS NULL "
                    f"THEN CAST(NULL AS BIGINT) ELSE 0 END)"
                )
                sql = sql[: m.start()] + repl + sql[close + 1 :]
        # round-8 gap scalars BEFORE the rename (2-arg array_length
        # collapses to the 1-arg form the rename maps to size)
        sql = self._rewrite_b29_fns(sql)
        # 3-arg regexp_matches BEFORE the rename (the 1:1 rename to
        # regexp_like only fits the 2-arg form)
        sql = self._rewrite_regexp_matches_flags(sql)
        sql = self._rewrite_function_names(sql)
        # batch-15 parity scalars after the rename table (their names
        # are not in it) and before lambda/scalar passes touch the args
        sql = self._rewrite_parity_fns(sql)
        # batch-16: ordered array_agg AFTER the list->array_agg rename,
        # unnest (FROM + select generator), COLLATE NOCASE
        sql = self._rewrite_array_agg_order(sql)
        # regexp_split_to_table(s, re) is unnest∘regexp-split (r13
        # probe batch B — was UNRESOLVED_ROUTINE); rewritten BEFORE the
        # unnest pass so generator placement rules apply unchanged
        while True:
            hit = self._call_args(
                re.compile(r"(?i)\bregexp_split_to_table\s*\("), sql
            )
            if not hit:
                break
            m, close, rst_args = hit
            if len(rst_args) != 2:
                raise UQueryError.sql_error(
                    "regexp_split_to_table expects (string, regex)"
                )
            sql = (
                sql[: m.start()]
                + f"unnest(split({rst_args[0]}, {rst_args[1]}, -1))"
                + sql[close + 1 :]
            )
        sql = self._rewrite_unnest(sql)
        sql = self._rewrite_collate(sql)
        # list_distinct NULL removal BEFORE b17/scalar passes that emit
        # Spark's native array_distinct internally
        sql = self._rewrite_list_distinct(sql)
        sql = self._rewrite_map_concat(sql)
        sql = self._rewrite_list_zip(sql)
        sql = self._rewrite_b17_scalars(sql)
        # batch-19 list family BEFORE list_aggregate (list_sum/avg/count
        # expand to list_aggregate text)
        sql = self._rewrite_b19_fns(sql)
        sql = self._rewrite_lambda_index(sql)
        # batch-12 operator symbols BEFORE divide_xor (whose xor() output
        # emits a genuine XOR ^) and before the list-metric translations
        sql = self._rewrite_operator_symbols(sql)
        # batch-20 AFTER operator symbols (postfix ! must not see !~)
        sql = self._rewrite_b20_fns(sql)
        # batch-22: printf/graphemes/AT TIME ZONE/split_part(…, 0)
        sql = self._rewrite_b22_fns(sql)
        # batch-23: timezone()/bar()/bitstring()/date_trunc DATE units
        sql = self._rewrite_b23_fns(sql)
        # batch-8 scalar semantics BEFORE list_nulls (that pass emits
        # array concat() calls that must stay un-stringified)
        sql = self._rewrite_scalar_semantics(sql)
        sql = self._rewrite_agg_semantics(sql)
        # batch-28 agg fixes AFTER agg_semantics (ORDER BY stripping,
        # favg emission) and BEFORE first_last (its min_by/max_by
        # emissions keep NULL values by design)
        sql = self._rewrite_b28_aggs(sql)
        sql = self._rewrite_topn_minmax(sql)
        # unordered array_agg NULL parity AFTER agg_semantics (FILTER
        # gains its WHERE keyword there) and BEFORE the window passes
        # (the emitted OVER name still gets named-spec inlining)
        sql = self._rewrite_array_agg_nulls(sql)
        # batch-15 nested aggregates (mad/entropy/histogram) emit plain
        # Spark lambdas/CASTs that later passes leave alone
        sql = self._rewrite_nested_aggs(sql)
        # batch-10 datetime corners BEFORE the epoch/ISO passes (the
        # EXTRACT conversion emits epoch()/isodow() function forms)
        sql = self._rewrite_datetime_corners(sql)
        sql = self._rewrite_string_list_corners(sql)
        sql = self._rewrite_list_agg_aliases(sql)
        sql = self._rewrite_list_aggregate(sql)
        sql = self._rewrite_list_reduce(sql)
        sql = self._rewrite_list_slice(sql)
        sql = self._rewrite_range_calls(sql)
        sql = self._rewrite_format(sql)
        sql = self._rewrite_date_diff(sql)
        sql = self._rewrite_dayname(sql)
        sql = self._rewrite_epoch(sql)
        # ordered-window percentiles BEFORE the WITHIN-GROUP quantile
        # rewrite (Spark's percentile family rejects ORDER BY specs)
        sql = self._rewrite_ordered_window_percentiles(sql)
        sql = self._rewrite_quantile(sql)
        sql = self._rewrite_product(sql)
        sql = self._rewrite_time_bucket(sql)
        sql = self._rewrite_similar_glob(sql)
        sql = self._strip_trailing_select_comma(sql)
        sql = self._rewrite_json_extract(sql)
        sql = self._rewrite_json_array_length(sql)
        sql = self._rewrite_json_valid(sql)
        # batch-21 JSON tail AFTER scalar_semantics (emits concat()
        # calls that must stay un-stringified) and after json_extract
        sql = self._rewrite_b21_json(sql)
        # batch-24: from_json/json_transform structure translation
        sql = self._rewrite_from_json(sql)
        sql = self._rewrite_iso_datetime(sql)
        sql = self._rewrite_to_interval(sql)
        sql = self._rewrite_sha256(sql)
        sql = self._rewrite_trim_chars(sql)
        sql = self._rewrite_quantified_cmp(sql)
        # DuckDB's arg-internal IGNORE/RESPECT NULLS relocates to
        # Spark's postfix placement BEFORE first_last parses the args
        sql = self._rewrite_ignore_nulls_arg(sql)
        sql = self._rewrite_first_last_order(sql)
        sql = self._rewrite_struct_extract(sql)
        sql = self._rewrite_list_has_all(sql)
        sql = self._rewrite_list_where(sql)
        sql = self._rewrite_list_index(sql)
        sql = self._rewrite_list_nulls(sql)
        sql = self._rewrite_hamming_to_base(sql)
        sql = self._rewrite_divide_xor(sql)
        sql = self._rewrite_regexp_replace(sql)
        sql = self._rewrite_regexp_extract(sql)
        sql = self._rewrite_list_sort(sql)
        sql = self._rewrite_array_to_string(sql)
        sql = self._rewrite_colon_cast(sql)
        # DuckDB ≥1.2 TRY(expr): after :: normalization so TRY(x::T)
        # sees the CAST form; before the JSON/interval cast passes so
        # the emitted try_cast rides them where applicable
        sql = self._rewrite_try_expr(sql)
        # batch-25: CAST(x AS JSON) — typeof-dispatched (VARCHAR input
        # validates and PRESERVES text, DuckDB-verified; other types
        # encode via the json writer); session identity literals
        sql = self._rewrite_json_cast(sql)
        sql = self._rewrite_interval_cast(sql)
        sql = self._rewrite_date_interval_widen(sql)
        # AFTER the widen pass, so DATE + mixed-literal still widens to
        # TIMESTAMP off the INTERVAL keyword before the literal becomes
        # a make_interval() call
        sql = self._rewrite_mixed_interval_literal(sql)
        sql = self._sub_code_fn(
            re.compile(r"(?i)\bcurrent_database\s*\(\s*\)"),
            lambda m: "'memory'",
            sql,
        )
        # round-8 gap-probe: version() mirrors the oracle engine's
        # 'vX.Y.Z'; count_star() is DuckDB's count(*) alias
        sql = self._sub_code_fn(
            re.compile(r"(?i)\bversion\s*\(\s*\)"),
            lambda m: f"'v{_duckdb_version()}'",
            sql,
        )
        sql = self._sub_code_fn(
            re.compile(r"(?i)\bcount_star\s*\(\s*\)"),
            lambda m: "count(*)",
            sql,
        )
        sql = self._sub_code_fn(
            re.compile(r"(?i)\bcurrent_user\b(?!\s*\()"),
            lambda m: "'duckdb'",
            sql,
        )
        sql = self._rewrite_struct_pack(sql)
        sql = self._rewrite_generate_series(sql)
        sql = self._rewrite_string_agg_order(sql)
        # batch-15 LIMIT n% before the window passes: its emitted
        # OVER (ORDER BY …) keys get NULLS LAST from _rewrite_order_nulls
        sql = self._rewrite_limit_pct(sql)
        # window passes after every ORDER-BY-generating expression pass:
        # named specs inline first, then null placement (the inlined text
        # gets NULLS LAST too), then frame EXCLUDE (its spec copies carry
        # the fixed null placement)
        sql = self._rewrite_named_window_ext(sql)
        sql = self._rewrite_order_nulls(sql)
        sql = self._rewrite_window_exclude(sql)
        sql = self._rewrite_distinct_over(sql)
        sql = self._rewrite_window_filter(sql)
        sql = self._rewrite_strftime(sql)
        sql = self._rewrite_exclude(sql)
        # USING SAMPLE n% must be consumed BEFORE the ÷0 pass (its '%'
        # precedes a parenthesized (method, seed) group the divisor
        # scan would otherwise wrap)
        sql = self._rewrite_using_sample(sql)
        # ÷0 → NULL parity BEFORE int_div (user `//` divisors wrap here,
        # emitting div directly). Macro expansion moved to the pipeline
        # HEAD in round 11 (macros shadow built-ins at bind time), so
        # expanded bodies already flowed through every pass above.
        sql = self._rewrite_div_by_zero(sql)
        sql = self._rewrite_int_div(sql)
        sql = self._rewrite_div_by_zero(sql)
        # ASOF after the expression passes: subquery relations must be
        # Spark-valid when their schema is probed (LIMIT 0)
        sql = self._rewrite_asof_join(sql)
        # projected IN (subquery) 3VL BEFORE qualify/distinct_on rewrite
        # the clause keywords the position classifier reads
        sql = self._rewrite_in_subquery_null(sql)
        sql = self._rewrite_distinct_on(sql)
        sql = self._rewrite_qualify(sql)
        sql = self._rewrite_star_replace(sql)
        sql = self._rewrite_columns_expr(sql)
        sql = self._rewrite_union_by_name(sql)
        # batch-15 struct_insert next to the other probe passes (same
        # Spark-valid-modulo-cast/len contract)
        sql = self._rewrite_struct_insert(sql)
        sql = self._rewrite_struct_extract_at(sql)
        # TIME casts become uq_poly markers BEFORE the resolver below
        sql = self._rewrite_time_cast(sql)
        # polymorphic subscripts resolve by LIMIT-0 probe — the text must
        # be fully Spark-valid modulo casts/len, which the probe composes
        sql = self._rewrite_poly_subscript(sql)
        # TIME ± INTERVAL wraparound AFTER the resolver: the pass
        # probe-dispatches each site in place on marker-free text
        # (an earlier marker-based version duplicated operands into
        # both arms and chains overflowed the resolver — NOTES r9)
        sql = self._rewrite_time_interval_wrap(sql)
        sql = self._rewrite_cast(sql)  # probes compose with _rewrite_len
        sql = self._rewrite_len(sql)  # LAST: probes need valid Spark SQL
        sql = self._rewrite_length_poly(sql)  # after len: same contract
        # every legitimate := consumer (struct_pack/struct_insert/TVF
        # options/macro tables) has run — a leftover := is a DuckDB
        # named-argument call, which Spark's builtins don't accept
        # (batch 16: clean raise, not a parser error)
        m = self._search_code(re.compile(r":="), sql)
        if m:
            raise UQueryError.sql_error(
                "named function arguments (name := value) are not supported"
            )
        # getattr: pure-rewrite property tests run on __new__ instances.
        # The dict clears unconditionally — a token that never survived
        # to the tail would otherwise linger as a stale entry (round-10
        # ADVICE; token names are a monotonic counter so even stale
        # entries could never collide, the clear just bounds memory)
        subs = getattr(self, "_pivot_name_subs", None)
        if subs:
            if "uq_pvn_" in sql:
                for tok in [t for t in subs if f"`{t}`" in sql]:
                    sql = sql.replace(f"`{tok}`", f"`{subs[tok]}`")
            subs.clear()
        return sql


# DuckDB read_csv option → Spark reader option
_OPTION_NAMES = {
    "delim": "sep",
    "sep": "sep",
    "header": "header",
    "quote": "quote",
    "escape": "escape",
    "nullstr": "nullValue",
    "sample_size": "samplingRatio",
    "compression": "compression",
}
