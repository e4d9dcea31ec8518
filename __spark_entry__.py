"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry runs the REAL pipeline: deterministic synth of a
syslog line per document (sparklog/synth.py) -> vectorized RFC5424 parse
(sparklog/parse.py) -> enrich/route/aggregate (sparklog/pipeline.py).
The matching ``oracle_sql()`` computes the expected values DIRECTLY from
the shared synthesis arithmetic (sparklog/synthrules.py) in DuckDB — a true
end-to-end roundtrip check: if the parser mangles any field, hashes diverge.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# make `sparklog` importable regardless of the caller's cwd
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparklog import pipeline as PL
from sparklog import synth
from sparklog import synthrules as R
from sparklog import textops
from sparklog import ann as ANN
from sparklog.udf import parse_df


_SHIPPED: set[str] = set()


def _ensure_shipped(spark: SparkSession) -> None:
    """Ship the sparklog package to executor python workers.

    If the driver process was started outside /root/repo, workers cannot
    unpickle UDF closures that reference the module; addPyFile fixes that
    regardless of cwd (and is a no-op burden when cwd is the repo).
    """
    # keyed on applicationId, not id(sparkContext): CPython can reuse an
    # id() after GC, which would silently skip shipping for a new context
    key = spark.sparkContext.applicationId
    if key in _SHIPPED:
        return
    try:
        import tempfile

        from jobs.package import build

        spark.sparkContext.addPyFile(
            build(tempfile.mkdtemp(prefix="sparklog_pyfiles_"))
        )
        _SHIPPED.add(key)
    except Exception as e:  # noqa: BLE001 - surface, then retry next call
        # an 'already added' duplicate is fine and final; anything else is
        # a real packaging failure — log it and DON'T cache, so the next
        # call retries instead of dying later with ModuleNotFoundError
        if "already" in str(e).lower():
            _SHIPPED.add(key)
        else:
            print(f"sparklog: addPyFile failed ({e!r}); will retry",
                  file=sys.stderr)


def _parsed(spark: SparkSession, sf_dir: str, corrupt: bool = False) -> DataFrame:
    _ensure_shipped(spark)
    return parse_df(synth.lines_df(spark, sf_dir, corrupt=corrupt))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synth -> parse -> enrich -> per-facility/severity/hour agg."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    parsed = _parsed(spark, "/root/testdata/sf0.001")
    ok, _ = PL.split_rejects(parsed)
    enriched = PL.enrich(ok, spark)
    return PL.hourly_agg(enriched).orderBy("facility_name", "severity_name", "hour_epoch")


# --- query registry ---------------------------------------------------------

def q_parse_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All RFC5424 header fields (PRI decode, version, strict timestamp with
    offsets+nanos, nil-vs-literal terms, ProcId sum type)."""
    return _parsed(spark, sf_dir).select(
        "doc_id", "severity", "facility", "version", "timestamp",
        "timestamp_nanos", "hostname", "appname", "procid_pid",
        "procid_name", "msgid",
    )


def q_msg_byte_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north-rule invariant: extracted MSG == pages.text, byte-identical."""
    return _parsed(spark, sf_dir).select("doc_id", "msg")


def _parsed_jvm(spark: SparkSession, sf_dir: str,
                corrupt: bool = False) -> DataFrame:
    """Same lines, parsed by the Tungsten fast path (sparklog/jparse.py):
    eligible rows never cross into Python; fallback rows reuse the exact
    Python path. Staged through parquet first — the shape every real
    deployment has (lines come from storage, not a fused synthesis
    projection whose combined stage would blow codegen's 64 KB method
    limit into interpreted fallback; measured, documented in jparse)."""
    import tempfile

    from sparklog.jparse import parse_df_jvm

    _ensure_shipped(spark)
    stage = tempfile.mkdtemp(prefix="sparklog_jvm_lines_")
    synth.lines_df(spark, sf_dir, corrupt=corrupt).write.mode(
        "overwrite").parquet(stage)
    return parse_df_jvm(spark.read.parquet(stage))


def q_parse_fields_jvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_fields through the JVM fast path — the driver proves the
    Tungsten parser field-identical against the SAME DuckDB oracle."""
    return _parsed_jvm(spark, sf_dir).select(
        "doc_id", "severity", "facility", "version", "timestamp",
        "timestamp_nanos", "hostname", "appname", "procid_pid",
        "procid_name", "msgid",
    )


def q_msg_byte_identity_jvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MSG byte-identity through the JVM fast path."""
    return _parsed_jvm(spark, sf_dir).select("doc_id", "msg")


def q_rejects_jvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Errors-as-data through the JVM fast path: corrupt rows must fall
    back to the Python path and carry the exact error variants."""
    return _parsed_jvm(spark, sf_dir, corrupt=True).select(
        "doc_id", "parse_error")


def q_sd_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StructuredData semantics: find_tuple lookups, duplicate-SD-ID merge,
    escape handling, SD-ID count (message.rs:113-143)."""
    p = _parsed(spark, sf_dir)
    return p.select(
        "doc_id",
        PL.sd_value("sd", "meta", "lang").alias("meta_lang"),
        PL.sd_value("sd", "meta", "seq").alias("meta_seq"),
        PL.sd_value("sd", "meta", "dup").alias("meta_dup"),
        PL.sd_value("sd", "esc", "note").alias("esc_note"),
        F.size("sd").cast("int").alias("sd_len"),
    )


def q_enrich_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-join enrichment against facility/severity/lang dims."""
    p = _parsed(spark, sf_dir)
    return PL.enrich(p, spark).select(
        "doc_id", "facility_name", "severity_name", "lang_name"
    )


def q_hourly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship aggregation: per-facility/severity/hour counts."""
    ok, _ = PL.split_rejects(_parsed(spark, sf_dir))
    return PL.hourly_agg(PL.enrich(ok, spark)).select(
        "facility_name", "severity_name", "hour_epoch", "n"
    )


def q_route_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-severity sink row counts (the routing fan-out contract)."""
    ok, _ = PL.split_rejects(_parsed(spark, sf_dir))
    return (
        PL.enrich(ok, spark, with_lang=False)
        .groupBy("severity_name").agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def q_rejects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Errors-as-data: corrupt lines produce null fields + the reference's
    error-variant name in parse_error (SURVEY.md §1.4)."""
    return _parsed(spark, sf_dir, corrupt=True).select("doc_id", "parse_error")


def q_routed_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conservation law: ok + rejects == input rows, per sink."""
    parsed = _parsed(spark, sf_dir, corrupt=True)
    sink = F.coalesce(F.col("severity_name"), F.lit("_rejects"))
    return (
        PL.enrich(parsed, spark, with_lang=False)
        .groupBy(sink.alias("sink"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def q_top_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort + limit over parsed output: top-10 hostnames by row count
    (ties broken by hostname; nil hostnames excluded)."""
    p = _parsed(spark, sf_dir)
    return (
        p.filter(F.col("hostname").isNotNull())
        .groupBy("hostname").agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.col("n").desc(), F.col("hostname"))
        .limit(10)
    )


def q_facility_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window function over the enriched output: per-severity top-3
    facilities by count (rank by n desc, facility_name)."""
    from pyspark.sql import Window

    ok, _ = PL.split_rejects(_parsed(spark, sf_dir))
    counts = PL.enrich(ok, spark, with_lang=False).groupBy(
        "severity_name", "facility_name"
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.partitionBy("severity_name").orderBy(
        F.col("n").desc(), F.col("facility_name")
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 3)
    )


def q_grok_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic grok/regex parse (JVM-side) over the events table's props
    strings; non-matching rows flagged errors-as-data style."""
    from sparklog.grok import grok

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = grok(
        events.select("event_id", "props"), "props",
        r'\{"k": %{INT:k}\}', types={"k": "int"},
    )
    return out.select(
        "event_id", "k",
        F.col("_grok_matched").cast("int").alias("matched"),
    )


# multi-group grok over the synthesized RFC5424 line itself: 7 named
# groups (2 typed) whose expected values all derive from the shared synth
# arithmetic — the oracle-checkable way to prove the single-pass rewrite
# (ONE regexp_replace + split instead of k+1 regexp_extracts) is
# semantics-preserving, not just pytest-equal (r2 ask #5)
_GROK_LINE_PAT = (
    r"<%{INT:pri:int}>%{INT:ver:int} %{NOTSPACE:ts} %{NOTSPACE:host}"
    r" %{NOTSPACE:app} %{NOTSPACE:proc} %{NOTSPACE:msgid} .*"
)


def _grok_line(spark: SparkSession, sf_dir: str, single_pass: bool) -> DataFrame:
    from sparklog.grok import grok

    _ensure_shipped(spark)
    lines = synth.lines_df(spark, sf_dir)
    out = grok(lines, "line", _GROK_LINE_PAT, single_pass=single_pass)
    return out.select(
        "doc_id", "pri", "ver", "ts", "host", "app", "proc", "msgid",
        F.col("_grok_matched").cast("int").alias("matched"),
    )


def q_grok_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group grok (k regexp_extracts; Catalyst prunes unused groups)."""
    return _grok_line(spark, sf_dir, single_pass=False)


def q_grok_line_sp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass grok (2 regex evaluations total) — same oracle as
    q_grok_line, so a green row proves output identity."""
    return _grok_line(spark, sf_dir, single_pass=True)


def _grok_line_oracle() -> str:
    """Expected grok-group values straight from the synthesis arithmetic;
    the timestamp string mirrors synth._ts_str via epoch-micros
    make_timestamp (timezone-free, unlike to_timestamp+strftime)."""
    base = (f"strftime(make_timestamp(CAST({R.WARC_SECS} AS BIGINT)"
            " * 1000000), '%Y-%m-%dT%H:%M:%S')")
    base_m5h = (f"strftime(make_timestamp((CAST({R.WARC_SECS} AS BIGINT)"
                " - 18000) * 1000000), '%Y-%m-%dT%H:%M:%S')")
    frac = "lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')"
    ts = f"""CASE doc_id % 5
            WHEN 0 THEN {base} || 'Z'
            WHEN 1 THEN {base} || '+00:00'
            WHEN 2 THEN {base_m5h} || '-05:00'
            WHEN 3 THEN {base} || '.' || {frac} || 'Z'
            ELSE '-' END"""
    return f"""
        SELECT doc_id,
               CAST({R.PRI} AS BIGINT) AS pri,
               CAST(1 AS BIGINT) AS ver,
               {ts} AS ts,
               COALESCE({R.HOSTNAME}, '-') AS host,
               COALESCE({R.APPNAME}, '-') AS app,
               {R.PROCID_TERM} AS proc,
               COALESCE({R.MSGID}, '-') AS msgid,
               CAST(1 AS INT) AS matched
        FROM documents
    """


def q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic event-stream rollup: per (event_type, hour) count / sum /
    max — the log-pipeline bread-and-butter aggregation over the events
    table. value sums go through DECIMAL(18,2) so the aggregate is exact
    and order-independent (a DOUBLE sum would be partial-agg-order
    dependent and could hash-diverge from the oracle in the last ulp)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double").alias("sum_value"),
            F.max("user_id").cast("long").alias("max_user"),
        )
    )


def q_rate_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(event_type, hour) volume z-scores + anomaly flags; all float
    math derives from exact integer sums, so the oracle is bit-identical."""
    from sparklog import eventops

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return eventops.rate_anomalies(ev)


def q_events_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count + exact-percentile aggregation per event_type —
    the dashboarding staples (count_distinct is a partial-agg shuffle on
    (type, user); percentile is exact with linear interpolation, which
    DuckDB's quantile_cont reproduces bit-for-bit)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("long").alias("n_users"),
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50_value"),
        F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95_value"),
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom grouped operator (applyInPandas): per-hostname gap-based
    sessionization, cross-checked against a pure-SQL window formulation."""
    return PL.sessionize_batch(_parsed(spark, sf_dir))


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.token_count(synth.load_documents(spark, sf_dir))


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.quality_score(synth.load_documents(spark, sf_dir))


# --- deterministic corpus augmentation -------------------------------------
# The raw gate corpus has no exact-duplicate texts and no cos>=0.9 embedding
# pairs, so dedup_exact / embedding_neardup would be vacuous 0-row greens
# (r2 verdict #2). Both queries therefore run over an augmented corpus:
# remapped copies of every AUG_STEP-th row are unioned in, mirrored exactly
# in the oracle SQL, so the expected result sets are non-empty and the
# operators are actually exercised end-to-end.
DOC_AUG_STEP = 7
DOC_AUG_OFFSET = 1_000_000
EMB_AUG_STEP = 11
EMB_AUG_OFFSET = 1_000_000


def _augmented_docs(docs: DataFrame) -> DataFrame:
    dup = docs.filter(F.col("doc_id") % DOC_AUG_STEP == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(DOC_AUG_OFFSET)
    )
    return docs.unionByName(dup)


def _augmented_emb(emb: DataFrame) -> DataFrame:
    dup = emb.filter(F.col("vec_id") % EMB_AUG_STEP == 0).withColumn(
        "vec_id", F.col("vec_id") + F.lit(EMB_AUG_OFFSET)
    )
    return emb.unionByName(dup)


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over the augmented corpus: every 7th doc has an exact
    copy under a remapped doc_id, so the expected group set is NON-empty
    (~n/7 groups of 2) and keep_doc_id = min proves survivor selection."""
    return textops.dedup_exact(_augmented_docs(synth.load_documents(spark, sf_dir)))


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.lang_id(synth.load_documents(spark, sf_dir))


def q_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-banded near-dup mining; the oracle computes the EXHAUSTIVE
    all-pairs Jaccard >= threshold set, so a green row asserts LSH recall
    = 1.0 on the gate data (not just that verified pairs are correct)."""
    return textops.minhash_neardup(synth.load_documents(spark, sf_dir))


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-banded SimHash pairs; banding is pigeonhole-exact for
    hamming <= 3, so the all-pairs oracle must match EXACTLY."""
    return textops.simhash_neardup(synth.load_documents(spark, sf_dir))


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.fingerprint(synth.load_documents(spark, sf_dir))


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.ngram_jaccard(synth.load_documents(spark, sf_dir))


def q_neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster resolution: connected components over the
    near-dup pair graph (hash-min label propagation; every doc gets a
    component_id, singletons included). Oracle = transitive closure via
    DuckDB recursive CTE over the exhaustive pair set."""
    return textops.neardup_components(synth.load_documents(spark, sf_dir))


def q_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain rollup over the pages table (the Common-Crawl staple:
    domain-level doc counts / volume for blocklists and sampling). The
    domain is extracted with a JVM regexp, NOT parse_url: parse_url
    follows RFC 3986 and returns NULL for a registered name starting
    with '-' (our host pool deliberately contains one, mirroring
    reference parser.rs:623-639) — a blocklist pipeline must see such
    hosts, not drop them. The oracle recomputes the domain from the
    same synthesis arithmetic, verifying the url build -> extract
    roundtrip exactly."""
    pages = synth.pages_df(spark, sf_dir)
    return (
        pages.select(
            F.regexp_extract(F.col("url"), r"^[a-z]+://([^/]+)", 1)
            .alias("domain"),
            F.length("text").alias("_chars"),
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_chars").cast("long").alias("total_chars"),
        )
    )


def q_domain_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain balancing: keep at most K docs per domain, chosen by
    deterministic content-independent hash order (md5 of the doc_id
    string — identical in both engines, so the oracle reproduces the
    exact survivor set). The anti-spam rebalancer every webtext corpus
    applies so one hot domain can't dominate training data. Skew-safe:
    textops.salted_topk's two-phase rank — per-(domain, salt) top-K then
    top-K of the bounded survivors — because a single Window partitioned
    by the Zipf-skewed domain key would put the hottest domain in ONE
    task, and AQE skew-split does not cover Window partitions."""
    K = 20
    pages = synth.pages_df(spark, sf_dir)
    domain = F.regexp_extract(F.col("url"), r"^[a-z]+://([^/]+)", 1)
    return textops.salted_topk(
        pages.select("doc_id", domain.alias("domain")),
        "domain",
        [F.md5(F.col("doc_id").cast("string")), F.col("doc_id")],
        k=K,
    )


# PII augmentation: deterministic synthetic PII appended from doc_id
# arithmetic, written in the ANSI subset BOTH engines evaluate
# identically (%, ||, CASE, CAST AS STRING, lpad) — the word-salad corpus
# contains no natural emails/IPs/phones, so without this the scrub green
# would be vacuous. Every 5th doc gains an email, every 6th an IPv4,
# every 11th a phone number.
def _pii_aug_expr(key: str = "doc_id") -> str:
    """Build the augmentation fragment keyed on ``key`` — composition
    queries key it on the ORIGINAL id (doc_id % offset) so augmented
    exact copies stay byte-identical to their originals."""
    return (
        f"text || CASE WHEN {key} % 5 = 0 THEN ' contact user'"
        f" || CAST({key} % 97 AS STRING) || '@mail.example.com' ELSE '' END"
        f" || CASE WHEN {key} % 6 = 0 THEN ' from 10.0.'"
        f" || CAST({key} % 256 AS STRING) || '.'"
        f" || CAST({key} % 250 AS STRING) ELSE '' END"
        f" || CASE WHEN {key} % 11 = 0 THEN ' call 415-555-'"
        f" || lpad(CAST({key} % 10000 AS STRING), 4, '0') ELSE '' END"
    )


PII_AUG_EXPR = _pii_aug_expr()


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over the PII-augmented corpus: typed placeholder
    substitution + per-doc match counts, all JVM regex (map-only pass).
    The oracle applies the same augmentation arithmetic and the same
    patterns with DuckDB's RE2 ('g' flag — Spark regexp_replace is
    global by default), proving the scrub byte-for-byte."""
    docs = synth.load_documents(spark, sf_dir)
    return textops.pii_scrub(
        docs.select("doc_id", F.expr(PII_AUG_EXPR).alias("text"))
    )


def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals (distinct-word ratio, top
    word/bigram fractions). Spark computes the top-element counts with a
    per-row sorted-array fold (no shuffle); the oracle recomputes the
    same integers relationally (unnest + group + max), so a hash match
    proves the fold against an independent formulation — non-vacuous by
    construction on the 31-token word-salad corpus."""
    return textops.repetition_score(synth.load_documents(spark, sf_dir))


def q_wet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WET-like multi-record source roundtrip: serialize the pages table
    to Common-Crawl-text-extract-shaped record files (magic line, headers,
    blank line, body), re-read them with the delimiter-split text scan
    (splittable at scale — see sparklog/io.py), and emit per-record
    integrity facts. The oracle derives url/md5/byte-length straight from
    the documents arithmetic, so a green row proves the writer->reader
    roundtrip is byte-exact AND every Content-Length header matches its
    decoded body (len_ok literally 1 in the oracle)."""
    import tempfile

    from sparklog import io as SIO

    pages = synth.pages_df(spark, sf_dir)
    path = os.path.join(
        tempfile.gettempdir(),
        f"sparklog_wet_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    SIO.write_wet(pages.select("url", "text"), path)
    wet = SIO.read_wet(spark, path)
    return wet.select(
        "url",
        F.md5("text").alias("body_md5"),
        F.octet_length("text").cast("long").alias("body_bytes"),
        "len_ok",
    )


def q_capped_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix capping: per-domain doc caps from a CAPS TABLE
    (cap = 5 * (len(domain) % 7) — deterministic shared arithmetic, and
    some domains legitimately get cap 0 = dropped), applied with the
    skew-safe two-phase salted rank (textops.capped_sample). The oracle
    reproduces the survivor set exactly with QUALIFY over a joined cap."""
    pages = synth.pages_df(spark, sf_dir)
    domain = F.regexp_extract(F.col("url"), r"^[a-z]+://([^/]+)", 1)
    d = pages.select("doc_id", domain.alias("domain"))
    caps = d.select("domain").distinct().select(
        "domain", (F.length("domain") % 7 * 5).cast("int").alias("cap")
    )
    return textops.capped_sample(
        d, caps, "domain",
        [F.md5(F.col("doc_id").cast("string")), F.col("doc_id")],
    )


def q_pack_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget pack (shard) assignment via the distributed
    prefix-sum (hex-nibble range buckets -> per-bucket running sums ->
    broadcast offsets). The oracle computes the SAME integers with one
    global SUM() OVER (ORDER BY ...) window — an independent
    formulation, so a hash match proves the two-phase decomposition."""
    return textops.pack_assign(synth.load_documents(spark, sf_dir),
                               budget=512)


def q_pack_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized pack shards: per-pack doc counts, token totals, and
    the concatenated pack_text in canonical order; oracle = ordered
    string_agg over the naive global-window pack assignment."""
    return textops.pack_texts(synth.load_documents(spark, sf_dir))


def q_clean_corpus_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL cleaning composition (PII scrub -> quality + lang +
    repetition gates on scrubbed text -> exact dedup) over the doubly
    augmented corpus: copies of every 7th doc (dedup non-vacuous) AND
    synthetic PII keyed on the ORIGINAL doc id (scrub non-vacuous,
    copies stay byte-identical). One scan + one shuffle — plan-audited
    in tests; the oracle rebuilds the whole five-stage pass in SQL."""
    docs = _augmented_docs(synth.load_documents(spark, sf_dir))
    aug = docs.select(
        "doc_id",
        F.expr(_pii_aug_expr(f"(doc_id % {DOC_AUG_OFFSET})")).alias("text"),
    )
    return textops.clean_corpus_full(aug)


# messy-URL augmentation (shared ANSI fragment): every 5th doc gets an
# UPPERCASED scheme+host, every 3rd tracking params, every 4th a fragment
def _messy_url_expr() -> str:
    return (
        f"(CASE WHEN doc_id % 5 = 0 THEN 'HTTPS://' || upper({R.HOST})"
        f" ELSE 'https://' || ({R.HOST}) END)"
        " || '/p/' || CAST(doc_id AS STRING)"
        " || CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&ref=1'"
        " ELSE '' END"
        " || CASE WHEN doc_id % 4 = 0 THEN '#sec-2' ELSE '' END"
    )


def q_canonical_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization over deterministically messed-up urls
    (uppercase hosts, utm params, fragments). STRONG oracle: the
    expected canonical form is recomputed from the synthesis arithmetic
    itself ('https://' || host || path [+ surviving params]) — it does
    NOT mirror the implementation, so a green row proves the normalize
    logic end-to-end, not that two copies of it agree."""
    docs = synth.load_documents(spark, sf_dir)
    messy = docs.select("doc_id", F.expr(_messy_url_expr()).alias("url"))
    return textops.canonical_url(messy).select(
        "doc_id", "url", "canonical_url"
    )


def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus profile over the augmented corpus (so
    n_distinct_texts < n_docs is a real, non-vacuous inequality)."""
    return textops.profile_docs(
        _augmented_docs(synth.load_documents(spark, sf_dir))
    )


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination gate: every train/valid doc's shingle overlap
    with the content-keyed TEST split — the exact setup a real pipeline
    runs (eval set = own held-out split, membership by k-shingle). The
    oracle rebuilds the split rule + shingle sets + membership join
    relationally."""
    docs = synth.load_documents(spark, sf_dir)
    split = textops.split_assign(docs)
    d = docs.join(split, "doc_id")
    ev = d.filter(F.col("split") == "test").select("doc_id", "text")
    tr = d.filter(F.col("split") != "test").select("doc_id", "text")
    return textops.contamination(tr, ev)


def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style unigram LM quality score. The parity trick: token
    log-probs are fixed-point micro-nat BIGINTs (floor(ln(p) * 1e6)), so
    per-doc sums are order-independent integer arithmetic — a raw double
    sum would vary with partition order and could never hash-match."""
    return textops.lm_score(synth.load_documents(spark, sf_dir))


def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-coverage (OOV) quality signal vs the corpus top-1000
    vocab; distributed top-k + broadcast membership join."""
    return textops.oov_rate(synth.load_documents(spark, sf_dir), k=1000)


def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-keyed train/valid/test split: md5-prefix bucketing, stable
    under re-crawls / repartitioning (eval never leaks into train)."""
    return textops.split_assign(synth.load_documents(spark, sf_dir))


def q_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4-style cleaning composition (quality gate + lang filter +
    exact-dedup survivors) over the AUGMENTED corpus, so the in-pass
    dedup is non-vacuous (every 7th doc has a copy -> n_copies = 2).
    One scan + one md5-key shuffle; see textops.clean_corpus."""
    return textops.clean_corpus(
        _augmented_docs(synth.load_documents(spark, sf_dir))
    )


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ANN.brute_force_topk(emb, n_queries=8, k=5)


# gate configs for the approximate ANN paths: the sf0.01 embeddings are
# near-uniform on the sphere (recall ~= probed fraction — measured), so
# these pin the smallest parameterization whose recall is exactly 1.0 on
# the gate data. That makes the exact-top-k DuckDB oracle applicable
# verbatim: a green row PROVES candidate generation lost nothing (the
# trick that made minhash_neardup oracle-checkable). Scale behavior is
# covered separately: auto-derived params (ann._auto_bits /
# ivf_train_fraction) plus clustered-corpus recall tests in
# tests/test_textops.py, where real cluster structure gives recall 1.0 at
# a ~12% probe fraction.
LSH_GATE = dict(n_bits=3, n_tables=8, multiprobe=1)
IVF_GATE = dict(n_centroids=8, n_probe=7, quantizer="sample")


def q_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiprobe sign-LSH ANN — bucketed candidates instead of the full
    corpus. Gate params give recall 1.0 at sf0.01, so the exact-top-k
    oracle checks the whole result (rank + cos_sim, hash-exact)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ANN.lsh_topk(emb, n_queries=8, k=5, **LSH_GATE)


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-list) ANN with the deterministic sample quantizer —
    KMeans center floats vary with the caller's partitioning, so the
    driver-gated config uses hash-sampled centers (bit-reproducible on
    any session). Gate params give recall 1.0 at sf0.01 -> exact oracle."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ANN.ivf_topk(emb, n_queries=8, k=5, **IVF_GATE)


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup over the augmented corpus: every 11th vector has
    an exact copy under a remapped vec_id (cos = 1.0), so the expected
    pair set is non-empty; the exhaustive oracle still proves LSH
    candidate recall 1.0."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ANN.embedding_neardup(_augmented_emb(emb), threshold=0.9)


def q_quantize_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 embedding quantization, checked ELEMENT-WISE: every (vec_id,
    position, quantized value, scale) against DuckDB recomputing the
    same floor-based arithmetic (floor, not round — round ties break
    differently across engines; floor is bit-deterministic)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = ANN.quantize_embeddings(emb)
    return out.select(
        "vec_id", "scale", F.posexplode("q").alias("i", "qv")
    ).select("vec_id", F.col("i").cast("long").alias("i"), "qv", "scale")


def q_sessionize_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase sessionization ((hostname, day) then boundary
    merge) — same semantics and oracle as q_sessionize, but no single
    task ever holds a whole hot host."""
    return PL.sessionize_scaled(_parsed(spark, sf_dir))


def q_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL multimodal decode roundtrip: deterministic PCM16 WAV payloads
    are written per doc by the stdlib wave encoder and decoded back by
    sparklog.multimodal.decode_binary (a genuine codec, not a fake byte
    format). The oracle recomputes the structural invariants — byte_len
    = 44-byte RIFF header + 2 bytes/sample, n_samples = 8000 + doc_id %
    1000, rate — from arithmetic; rms/peak are pytest-covered."""
    from sparklog import multimodal as MM

    _ensure_shipped(spark)
    docs = synth.load_documents(spark, sf_dir)
    feats = MM.audio_features(MM.synth_audio_df(docs))
    return feats.select(
        "doc_id", "byte_len", "sample_rate", "n_samples",
        # JVM-side division (not the UDF's rounded value) so the double
        # is bit-identical to the oracle's CAST(n AS DOUBLE)/rate
        (F.col("n_samples").cast("double") / F.col("sample_rate"))
        .alias("duration_sec"),
    )


# line-structure augmentation for the C4 line filter: the word-salad
# corpus is single-line with no punctuation, so the gate would be
# vacuous on it raw. Deterministic, engine-shared: split pseudo-lines
# at 'e '->'e.\n' (every line formed this way ends '.'), prepend a
# banned 'lorem ipsum' line on every 7th doc (>=3 words + '.', so ONLY
# the ban drops it), append a 1-word 'ok.' line on every 5th (punct ok,
# so ONLY min_words drops it); the final unpunctuated tail exercises
# the terminal-punct gate. All three gates proven non-vacuous.
LINE_AUG_EXPR = (
    "CASE WHEN doc_id % 7 = 0 THEN 'lorem ipsum filler here.' || chr(10) "
    "ELSE '' END "
    "|| replace(text, 'e ', 'e.' || chr(10)) "
    "|| CASE WHEN doc_id % 5 = 1 THEN chr(10) || 'ok.' ELSE '' END"
)


def q_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-level cleaning over the line-augmented corpus; the
    oracle applies the identical keep-rule with DuckDB list lambdas."""
    docs = synth.load_documents(spark, sf_dir)
    return textops.line_filter(
        docs.select("doc_id", F.expr(LINE_AUG_EXPR).alias("text"))
    )


# blocklist chosen against the synthesis host pool so every match mode
# is non-vacuous: one exact host, one parent domain (blocks all
# node-*.example.net), one deeper-than-parent entry proving
# longest-match specificity
URL_BLOCKLIST = ["db-03.example.com", "example.net", "node-3.example.net"]


def q_url_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-blocklist gate over the pages table: exact-host, parent-
    domain, and longest-match semantics all exercised; the oracle
    rebuilds suffix generation + membership relationally."""
    pages = synth.pages_df(spark, sf_dir)
    bl = spark.createDataFrame([(d,) for d in URL_BLOCKLIST],
                               "domain STRING")
    return textops.url_filter(pages, bl)


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-global C4 line dedup over the line-augmented corpus (the
    'e.'-split pseudo-lines repeat heavily ACROSS docs, so cross-doc
    dedup is strongly non-vacuous); the oracle states first-occurrence
    survival with a QUALIFY window + ordered string_agg."""
    docs = synth.load_documents(spark, sf_dir)
    return textops.line_dedup(
        docs.select("doc_id", F.expr(LINE_AUG_EXPR).alias("text"))
    )


def q_dup_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-passage rates over the augmented corpus (exact copies
    guarantee shared shingles -> non-vacuous n_dup); the oracle rebuilds
    shingle sets + document counts relationally."""
    return textops.dup_passages(
        _augmented_docs(synth.load_documents(spark, sf_dir))
    )


def q_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 corpus bigrams with counts; the oracle rebuilds n-gram
    formation + counting + deterministic tie-break relationally."""
    return textops.ngram_topk(synth.load_documents(spark, sf_dir))


# realistic-markup augmentation for the HTML extractor: script with a
# bare '<' inside, style, comments, entity-encoded tail — all pure
# doc_id/text arithmetic so the oracle can state the EXPECTED extracted
# text independently of the extraction regexes
HTML_AUG_EXPR = (
    "'<html><head><title>t</title>"
    "<script type=\"text/javascript\">var x = 1 < 2;</script>"
    "<style>.c { color: red }</style></head><body><p>' || text || "
    "'</p><!-- crawl ' || CAST(doc_id AS STRING) || ' -->"
    "<div>&amp; tail &lt;' || CAST(doc_id % 10 AS STRING) || "
    "'&gt;</div></body></html>'"
)


def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML -> text extraction over realistic augmented markup; the
    oracle computes the expected output from the same arithmetic
    ('t' + text + decoded tail), NOT by mirroring the regexes — an
    independent byte-identity gate on the extraction step."""
    docs = synth.load_documents(spark, sf_dir)
    pages = docs.select(
        "doc_id", F.expr(HTML_AUG_EXPR).cast("binary").alias("html")
    )
    return textops.html_to_text(pages)


def q_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints; fps joined to a csv string so the driver
    hash-compares a scalar column (array-column hashing is
    representation-sensitive across engines)."""
    out = textops.winnow_fingerprints(
        synth.load_documents(spark, sf_dir)
    )
    return out.select(
        "doc_id", "n_grams", "n_fps",
        F.array_join("fps", ",").alias("fp_csv"),
    )


def q_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode roundtrip (new r5): deterministic binary-PPM
    payloads per doc (synth_ppm — pure doc_id arithmetic), decoded by
    the from-scratch netpbm decoder (sparklog.multimodal.decode_image,
    no external codec). The oracle recomputes dimensions and the exact
    P6 byte accounting relationally; mean/std of the decoded raster are
    pytest-covered against numpy (not SQL-expressible)."""
    from sparklog import multimodal as MM

    _ensure_shipped(spark)
    docs = synth.load_documents(spark, sf_dir)
    feats = MM.image_features(MM.synth_image_df(docs))
    return feats.select(
        "doc_id", "byte_len", "width", "height", "channels")


def q_sessionize_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third sessionization twin: Spark's built-in session_window (pure
    Catalyst, streaming-ready) — same semantics, same oracle."""
    return PL.sessionize_native(_parsed(spark, sf_dir))


def q_json_serialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """serde-byte-identical JSON encoding (rows-only check; exact strings
    are asserted against the reference's expected JSON in tests)."""
    from sparklog import serialize
    p = _parsed(spark, sf_dir)
    return p.select("doc_id", serialize.json_col(p).alias("json"))


def _lang_id_oracle(src: str = "documents") -> str:
    """DuckDB mirror of textops.lang_id: same marker lists, same
    set-intersection scoring (both engines dedup), same tie-break order.
    ``src`` lets composition oracles score an augmented CTE instead."""
    from sparklog.textops import _LANG_MARKERS

    langs = list(_LANG_MARKERS)
    score_cols = []
    for lg, markers in _LANG_MARKERS.items():
        lit = "[" + ", ".join(f"'{m}'" for m in markers) + "]"
        score_cols.append(f"len(list_intersect(ws, {lit})) AS s_{lg}")
    best = "greatest(" + ", ".join(f"s_{lg}" for lg in langs) + ")"
    arms = " ".join(f"WHEN s_{lg} = {best} THEN '{lg}'" for lg in langs)
    return f"""
        WITH w AS (
          SELECT doc_id, string_split(lower(text), ' ') AS ws FROM {src}
        ), s AS (
          SELECT doc_id, {', '.join(score_cols)} FROM w
        )
        SELECT doc_id,
               CASE WHEN {best} = 0 THEN 'und' {arms} END AS pred_lang,
               CAST({best} AS INT) AS score
        FROM s
    """


def _simhash_oracle() -> str:
    """DuckDB mirror of textops.simhash_neardup: identical 62-bit token
    hashing (two 31-bit polynomial folds, bases 31/37, packed h1 + h2*2^31),
    identical bit votes, then EXHAUSTIVE all-pairs hamming <= 3 — the chunk
    banding in the Spark operator is pigeonhole-exact for distance 3, so
    the sets must match."""
    from sparklog.textops import SIMHASH_BITS, _SH_P, _SH_SHIFT

    pows = [1 << b for b in range(SIMHASH_BITS)]
    vote_cols = ", ".join(
        f"SUM(CASE WHEN (h // {p}) % 2 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b, p in enumerate(pows)
    )
    sig_sum = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN {p} ELSE 0 END)" for b, p in enumerate(pows)
    )
    return f"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
          FROM documents
        ), chars AS (
          SELECT doc_id,
                 list_prepend(CAST(0 AS BIGINT),
                   list_transform(range(1, length(tok) + 1),
                                  i -> CAST(ascii(substr(tok, i, 1)) AS BIGINT)))
                   AS cs
          FROM toks
        ), th AS (
          SELECT doc_id,
                 list_reduce(cs, (hh, c) -> (hh * 31 + c) % {_SH_P})
                 + list_reduce(cs, (hh, c) -> (hh * 37 + c) % {_SH_P})
                   * CAST({_SH_SHIFT} AS BIGINT) AS h
          FROM chars
        ), votes AS (
          SELECT doc_id, {vote_cols} FROM th GROUP BY doc_id
        ), sig AS (
          SELECT d.doc_id, CAST(COALESCE({sig_sum}, 0) AS BIGINT) AS simhash
          FROM documents d LEFT JOIN votes v ON v.doc_id = d.doc_id
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        FROM sig a JOIN sig b ON b.doc_id > a.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """


def _ann_norm_cte() -> str:
    """Shared CTE prefix: embeddings cast to DOUBLE + sequential-fold norms
    (list_reduce with a prepended 0 reproduces Spark's aggregate() fold
    order exactly, so doubles are bit-identical)."""
    return """
        WITH e AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
          FROM embeddings
        ), n AS (
          SELECT vec_id, emb,
                 sqrt(list_reduce(
                   list_prepend(CAST(0 AS DOUBLE),
                                list_transform(emb, x -> x * x)),
                   (a, b) -> a + b)) AS nrm
          FROM e
        )
    """


_SEQ_DOT = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE),"
    " list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i])),"
    " (x, y) -> x + y)"
)


def _ann_topk_oracle(n_queries: int = 8, k: int = 5) -> str:
    dot = _SEQ_DOT.format(a="q.qe", b="c.emb")
    return f"""
        {_ann_norm_cte()}, q AS (
          SELECT vec_id AS query_id, emb AS qe, nrm AS qn
          FROM n ORDER BY vec_id LIMIT {n_queries}
        ), s AS (
          SELECT q.query_id, c.vec_id AS neighbor_id,
                 {dot} / (q.qn * c.nrm) AS cs
          FROM q JOIN n c ON c.vec_id <> q.query_id
        )
        SELECT query_id, neighbor_id,
               CAST(row_number() OVER (
                 PARTITION BY query_id ORDER BY cs DESC, neighbor_id) AS INT)
                 AS rank,
               ROUND(cs, 6) AS cos_sim
        FROM s
        QUALIFY rank <= {k}
    """


def _embedding_neardup_oracle(threshold: float = 0.9) -> str:
    """Exhaustive all-pairs cosine over the AUGMENTED corpus (mirrors
    _augmented_emb: a copy of every 11th vector under a remapped vec_id,
    so the expected pair set is non-empty — the identity pairs at cos 1.0
    — and a green row still proves LSH candidate recall 1.0)."""
    dot = _SEQ_DOT.format(a="a.emb", b="b.emb")
    return f"""
        WITH aug AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL
          SELECT vec_id + {EMB_AUG_OFFSET} AS vec_id, embedding
          FROM embeddings WHERE vec_id % {EMB_AUG_STEP} = 0
        ), e AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
          FROM aug
        ), n AS (
          SELECT vec_id, emb,
                 sqrt(list_reduce(
                   list_prepend(CAST(0 AS DOUBLE),
                                list_transform(emb, x -> x * x)),
                   (a, b) -> a + b)) AS nrm
          FROM e
        )
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               ROUND({dot} / (a.nrm * b.nrm), 6) AS cos_sim
        FROM n a JOIN n b ON b.vec_id > a.vec_id
        WHERE {dot} / (a.nrm * b.nrm) >= {threshold}
    """


def _json_oracle() -> str:
    """The exact serde byte stream, rebuilt from synthesis arithmetic:
    field order / null-keeping / enum names / ProcId union / sorted-SD
    layout all mirror sparklog/serialize.py (reference message.rs:210-232).
    Document text is printable-ASCII with no quote/backslash at every SF
    (asserted in tests), so msg embeds verbatim; the sd escape values are
    fixed literals escaped by hand."""

    def jstr(expr: str) -> str:
        return (f"CASE WHEN ({expr}) IS NULL THEN 'null' "
                f"ELSE '\"' || ({expr}) || '\"' END")

    def jnum(expr: str) -> str:
        return f"COALESCE(CAST(({expr}) AS VARCHAR), 'null')"

    procid = (
        f"CASE WHEN ({R.PROCID_PID}) IS NOT NULL "
        f"THEN CAST(({R.PROCID_PID}) AS VARCHAR) "
        f"WHEN ({R.PROCID_NAME}) IS NOT NULL "
        f"THEN '\"' || ({R.PROCID_NAME}) || '\"' ELSE 'null' END"
    )
    # sd keys in BTreeMap (sorted) order: esc < ext@9 < meta < origin
    esc_part = (
        r"""CASE WHEN """ + R.SD_HAS_ESC +
        r""" THEN '"esc":{"note":"q\"v","path":"a\\b"},' ELSE '' END"""
    )
    sd = f"""CASE WHEN {R.SD_NIL} THEN '{{}}' ELSE '{{'
        || {esc_part}
        || CASE WHEN {R.SD_HAS_EMPTY} THEN '"ext@9":{{}},' ELSE '' END
        || '"meta":{{'
        || CASE WHEN {R.SD_HAS_DUP}
             THEN '"dup":"' || CAST(doc_id % 2 AS VARCHAR) || '",'
             ELSE '' END
        || '"lang":"' || lang || '","seq":"' || CAST(doc_id AS VARCHAR) || '"}}'
        || CASE WHEN {R.SD_HAS_ORIGIN}
             THEN ',"origin":{{"x-service":"svc'
                  || CAST(doc_id % 4 AS VARCHAR) || '"}}'
             ELSE '' END
        || '}}' END"""
    return f"""
        SELECT doc_id,
               '{{"severity":"' || ({R.SEVERITY_NAME})
               || '","facility":"' || ({R.FACILITY_NAME})
               || '","version":1,"timestamp":' || {jnum(R.TS_SECS)}
               || ',"timestamp_nanos":' || {jnum(R.TS_NANOS)}
               || ',"hostname":' || {jstr(R.HOSTNAME)}
               || ',"appname":' || {jstr(R.APPNAME)}
               || ',"procid":' || {procid}
               || ',"msgid":' || {jstr(R.MSGID)}
               || ',"sd":' || {sd}
               || ',"msg":"' || text || '"}}' AS json
        FROM documents
    """


_STOPWORD_LIST = (
    "[" + ", ".join(f"'{w}'" for w in textops.QUALITY_STOPWORDS) + "]"
)

# shared minhash-oracle CTE body: distinct 5-char shingle sets + sizes.
# The size-ratio prefilter used with it is provably lossless: jaccard >= t
# implies |A n B| >= t*|A u B|; |A n B| <= min(|A|,|B|) and |A u B| >=
# max(|A|,|B|), so any qualifying pair has min >= t * max — pruning the
# rest cannot drop a true pair.
_MINHASH_CTE_BODY = """sh AS (
              SELECT doc_id,
                     list_distinct(list_transform(range(0, length(text) - 4),
                                                  i -> substr(text, i + 1, 5))) AS s
              FROM documents WHERE length(text) >= 5
            ), shn AS (
              SELECT doc_id, s, len(s) AS ns FROM sh
            )"""


def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        # the engine works in unix seconds; timestamp RENDERING during
        # synthesis must be UTC-stable even on a caller-provided session
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        _ensure_shipped(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {k: _wrap(v) for k, v in _QUERIES.items()}


_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "parse_fields": q_parse_fields,
        "msg_byte_identity": q_msg_byte_identity,
        "parse_fields_jvm": q_parse_fields_jvm,
        "msg_byte_identity_jvm": q_msg_byte_identity_jvm,
        "rejects_jvm": q_rejects_jvm,
        "sd_lookup": q_sd_lookup,
        "enrich_names": q_enrich_names,
        "hourly_agg": q_hourly_agg,
        "route_counts": q_route_counts,
        "rejects": q_rejects,
        "routed_total": q_routed_total,
        "top_hosts": q_top_hosts,
        "facility_rank": q_facility_rank,
        "sessionize": q_sessionize,
        "sessionize_scaled": q_sessionize_scaled,
        "sessionize_native": q_sessionize_native,
        "grok_events": q_grok_events,
        "grok_line": q_grok_line,
        "grok_line_sp": q_grok_line_sp,
        "events_rollup": q_events_rollup,
        "events_user_stats": q_events_user_stats,
        "rate_anomalies": q_rate_anomalies,
        "token_count": q_token_count,
        "quality_score": q_quality_score,
        "dedup_exact": q_dedup_exact,
        "lang_id": q_lang_id,
        "minhash_neardup": q_minhash_neardup,
        "neardup_components": q_neardup_components,
        "clean_corpus": q_clean_corpus,
        "split_assign": q_split_assign,
        "pii_scrub": q_pii_scrub,
        "repetition": q_repetition,
        "wet_roundtrip": q_wet_roundtrip,
        "capped_sample": q_capped_sample,
        "pack_assign": q_pack_assign,
        "pack_texts": q_pack_texts,
        "quantize_emb": q_quantize_emb,
        "clean_corpus_full": q_clean_corpus_full,
        "lm_score": q_lm_score,
        "canonical_url": q_canonical_url,
        "contamination": q_contamination,
        "profile": q_profile,
        "oov_rate": q_oov_rate,
        "domain_stats": q_domain_stats,
        "domain_balance": q_domain_balance,
        "simhash": q_simhash,
        "fingerprint": q_fingerprint,
        "ngram_jaccard": q_ngram_jaccard,
        "ann_topk": q_ann_topk,
        "lsh_topk": q_lsh_topk,
        "ivf_topk": q_ivf_topk,
        "embedding_neardup": q_embedding_neardup,
        "json_serialize": q_json_serialize,
        "audio_meta": q_audio_meta,
        "image_meta": q_image_meta,
        "line_filter": q_line_filter,
        "dup_passages": q_dup_passages,
        "ngram_topk": q_ngram_topk,
        "winnow": q_winnow,
        "html_extract": q_html_extract,
        "line_dedup": q_line_dedup,
        "url_filter": q_url_filter,
    }


def oracle_sql() -> dict[str, str]:
    # SQL-escape the BPE alternation for embedding in a DuckDB literal
    bpe = textops.BPE_TOKEN_RE.replace("'", "''")
    out = {
        "parse_fields": f"""
            SELECT doc_id,
                   {R.SEVERITY} AS severity,
                   {R.FACILITY} AS facility,
                   {R.VERSION} AS version,
                   {R.TS_SECS} AS timestamp,
                   {R.TS_NANOS} AS timestamp_nanos,
                   {R.HOSTNAME} AS hostname,
                   {R.APPNAME} AS appname,
                   {R.PROCID_PID} AS procid_pid,
                   {R.PROCID_NAME} AS procid_name,
                   {R.MSGID} AS msgid
            FROM documents
        """,
        "msg_byte_identity": "SELECT doc_id, text AS msg FROM documents",
        "sd_lookup": f"""
            SELECT doc_id,
                   {R.SD_META_LANG} AS meta_lang,
                   {R.SD_META_SEQ} AS meta_seq,
                   {R.SD_META_DUP} AS meta_dup,
                   {R.SD_ESC_NOTE} AS esc_note,
                   CAST({R.SD_LEN} AS INT) AS sd_len
            FROM documents
        """,
        "enrich_names": f"""
            SELECT doc_id,
                   {R.FACILITY_NAME} AS facility_name,
                   {R.SEVERITY_NAME} AS severity_name,
                   CASE WHEN {R.SD_NIL} THEN NULL ELSE {R.LANG_NAME} END AS lang_name
            FROM documents
        """,
        "hourly_agg": f"""
            SELECT {R.FACILITY_NAME} AS facility_name,
                   {R.SEVERITY_NAME} AS severity_name,
                   {R.HOUR_EPOCH} AS hour_epoch,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM documents
            GROUP BY 1, 2, 3
        """,
        "route_counts": f"""
            SELECT {R.SEVERITY_NAME} AS severity_name,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM documents GROUP BY 1
        """,
        "rejects": f"""
            SELECT doc_id, {R.CORRUPT_ERROR} AS parse_error FROM documents
        """,
        "routed_total": f"""
            SELECT CASE WHEN {R.CORRUPT} THEN '_rejects'
                        ELSE {R.SEVERITY_NAME} END AS sink,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM documents GROUP BY 1
        """,
        "top_hosts": f"""
            SELECT hostname, CAST(COUNT(*) AS BIGINT) AS n
            FROM (SELECT {R.HOSTNAME} AS hostname FROM documents)
            WHERE hostname IS NOT NULL
            GROUP BY 1
            ORDER BY n DESC, hostname
            LIMIT 10
        """,
        "facility_rank": f"""
            WITH c AS (
              SELECT {R.SEVERITY_NAME} AS severity_name,
                     {R.FACILITY_NAME} AS facility_name,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM documents GROUP BY 1, 2
            )
            SELECT severity_name, facility_name, n,
                   CAST(row_number() OVER (
                     PARTITION BY severity_name
                     ORDER BY n DESC, facility_name) AS INT) AS rnk
            FROM c
            QUALIFY rnk <= 3
        """,
        "token_count": f"""
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   CAST(len(regexp_extract_all(text, '{bpe}'))
                        AS BIGINT) AS n_tokens_bpe,
                   CAST(length(text) AS BIGINT) AS n_chars
            FROM documents
        """,
        "quality_score": f"""
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
                   ROUND(CAST(length(text) AS DOUBLE)
                         / len(string_split(text, ' ')), 4) AS avg_word_len,
                   ROUND(CAST(len(regexp_extract_all(text,
                           '[^\\sA-Za-z0-9]')) AS DOUBLE)
                         / greatest(length(text), 1), 4) AS punct_ratio,
                   ROUND(CAST(len(list_filter(string_split(lower(text), ' '),
                           w -> list_contains({_STOPWORD_LIST}, w)))
                           AS DOUBLE)
                         / len(string_split(text, ' ')), 4) AS stopword_ratio,
                   CASE WHEN length(text) >= 100
                         AND len(string_split(text, ' ')) >= 20
                        THEN 1 ELSE 0 END AS quality_ok
            FROM documents
        """,
        # over the augmented corpus (mirrors _augmented_docs): a copy of
        # every 7th doc, so the expected group set is non-empty — this is
        # what de-vacuates the r2 0-row green
        "dedup_exact": f"""
            WITH aug AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + {DOC_AUG_OFFSET} AS doc_id, text
              FROM documents WHERE doc_id % {DOC_AUG_STEP} = 0
            )
            SELECT md5(text) AS text_md5,
                   CAST(COUNT(*) AS BIGINT) AS n_dups,
                   CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id
            FROM aug GROUP BY 1 HAVING COUNT(*) > 1
        """,
        "grok_events": r"""
            SELECT event_id,
                   CASE WHEN regexp_matches(props, '^\{"k": [+-]?\d+\}$')
                        THEN CAST(regexp_extract(props, '([+-]?\d+)', 1) AS INT)
                        END AS k,
                   CASE WHEN regexp_matches(props, '^\{"k": [+-]?\d+\}$')
                        THEN 1 ELSE 0 END AS matched
            FROM events
        """,
        "sessionize": f"""
            WITH e AS (
              SELECT {R.HOSTNAME} AS hostname, {R.TS_SECS} AS ts
              FROM documents
              WHERE ({R.HOSTNAME}) IS NOT NULL AND ({R.TS_SECS}) IS NOT NULL
            ), s AS (
              SELECT hostname, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                               OR ts - lag(ts) OVER w > 1800
                          THEN 1 ELSE 0 END AS brk
              FROM e WINDOW w AS (PARTITION BY hostname ORDER BY ts)
            ), g AS (
              SELECT hostname, ts,
                     SUM(brk) OVER (PARTITION BY hostname ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
              FROM s
            )
            SELECT hostname,
                   CAST(MIN(ts) AS BIGINT) AS session_start,
                   CAST(MAX(ts) AS BIGINT) AS session_end,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM g GROUP BY hostname, sid
        """,
        "lang_id": _lang_id_oracle(),
        # md5 hex strings compare identically in both engines, so the
        # split thresholds are engine-portable string literals
        "split_assign": f"""
            SELECT doc_id,
                   CASE WHEN substr(md5(text), 1, 8)
                             < '{textops.SPLIT_BOUNDS[0][1]}'
                          THEN '{textops.SPLIT_BOUNDS[0][0]}'
                        WHEN substr(md5(text), 1, 8)
                             < '{textops.SPLIT_BOUNDS[1][1]}'
                          THEN '{textops.SPLIT_BOUNDS[1][0]}'
                        ELSE 'train' END AS split
            FROM documents
        """,
        # same augmentation arithmetic, same regex patterns; DuckDB
        # regexp_replace needs the 'g' flag to match Spark's
        # always-global behavior, counts via len(regexp_extract_all) on
        # the text AFTER the prior replacements (sequential counting —
        # counts == placeholders emitted, matching textops.pii_scrub)
        "pii_scrub": f"""
            WITH aug AS (
              SELECT doc_id, {PII_AUG_EXPR} AS text FROM documents
            ), seq AS (
              SELECT doc_id, text,
                     regexp_replace(text,
                       '{textops.PII_EMAIL_RE}', '<EMAIL>', 'g') AS t1
              FROM aug
            ), seq2 AS (
              SELECT doc_id, text, t1,
                     regexp_replace(t1,
                       '{textops.PII_IPV4_RE}', '<IP>', 'g') AS t2
              FROM seq
            )
            SELECT doc_id,
                   regexp_replace(t2,
                     '{textops.PII_PHONE_RE}', '<PHONE>', 'g')
                     AS clean_text,
                   CAST(len(regexp_extract_all(text,
                     '{textops.PII_EMAIL_RE}')) AS BIGINT) AS n_emails,
                   CAST(len(regexp_extract_all(t1,
                     '{textops.PII_IPV4_RE}')) AS BIGINT) AS n_ips,
                   CAST(len(regexp_extract_all(t2,
                     '{textops.PII_PHONE_RE}')) AS BIGINT) AS n_phones
            FROM seq2
        """,
        # independent relational formulation of the sorted-array fold:
        # top-element counts via unnest + group + max; ratios are the
        # same IEEE divisions of the same exact integers
        "repetition": """
            WITH w AS (
              SELECT doc_id,
                     list_filter(string_split(lower(text), ' '),
                                 x -> x <> '') AS w
              FROM documents
            ), base AS (
              SELECT doc_id, len(w) AS n, len(list_distinct(w)) AS nd
              FROM w
            ), topw AS (
              SELECT doc_id, max(c) AS top_w FROM (
                SELECT doc_id, tok, COUNT(*) AS c FROM (
                  SELECT doc_id, unnest(w) AS tok FROM w
                ) GROUP BY doc_id, tok
              ) GROUP BY doc_id
            ), bi AS (
              SELECT doc_id, w[i] || ' ' || w[i + 1] AS bg
              FROM (
                SELECT doc_id, w,
                       unnest(generate_series(1, len(w) - 1)) AS i
                FROM w WHERE len(w) >= 2
              )
            ), topb AS (
              SELECT doc_id, max(c) AS top_b,
                     CAST(SUM(c) AS BIGINT) AS nb
              FROM (
                SELECT doc_id, bg, COUNT(*) AS c FROM bi GROUP BY doc_id, bg
              ) GROUP BY doc_id
            )
            SELECT b.doc_id,
                   CAST(b.n AS BIGINT) AS n_words,
                   CAST(b.nd AS BIGINT) AS n_distinct,
                   CAST(COALESCE(t.top_w, 0) AS BIGINT) AS top_word_n,
                   CAST(COALESCE(tb.top_b, 0) AS BIGINT) AS top_bigram_n,
                   CASE WHEN b.n > 0 THEN CAST(b.nd AS DOUBLE)
                        / CAST(b.n AS DOUBLE) END AS distinct_ratio,
                   CASE WHEN b.n > 0 THEN CAST(COALESCE(t.top_w, 0) AS DOUBLE)
                        / CAST(b.n AS DOUBLE) END AS top_word_frac,
                   CASE WHEN COALESCE(tb.nb, 0) > 0
                        THEN CAST(tb.top_b AS DOUBLE)
                             / CAST(tb.nb AS DOUBLE) END AS top_bigram_frac
            FROM base b
            LEFT JOIN topw t USING (doc_id)
            LEFT JOIN topb tb USING (doc_id)
        """,
        # WET writer->reader roundtrip: expected facts derive from the
        # shared url/text arithmetic; len_ok is literal 1 (every record's
        # Content-Length header must match its decoded body)
        "wet_roundtrip": f"""
            SELECT {R.URL} AS url,
                   md5(text) AS body_md5,
                   CAST(strlen(text) AS BIGINT) AS body_bytes,
                   1 AS len_ok
            FROM documents
        """,
        # element-wise int8 quantization parity: same floor arithmetic,
        # same float->double widening, 1-based list index shifted to 0
        "quantize_emb": """
            WITH s AS (
              SELECT vec_id, embedding,
                     list_max(list_transform(embedding,
                       x -> abs(CAST(x AS DOUBLE)))) AS scale
              FROM embeddings
            ), ex AS (
              SELECT vec_id, embedding, scale,
                     unnest(generate_series(1, len(embedding))) AS i
              FROM s
            )
            SELECT vec_id,
                   CAST(i - 1 AS BIGINT) AS i,
                   CASE WHEN scale > 0
                        THEN CAST(greatest(-127, least(127,
                             floor(CAST(embedding[i] AS DOUBLE)
                                   / scale * 127))) AS INT)
                        ELSE 0 END AS qv,
                   scale
            FROM ex
        """,
        # per-domain caps from the cap table, survivor set by md5 order
        "capped_sample": f"""
            WITH d AS (
              SELECT doc_id, {R.HOST} AS domain FROM documents
            ), c AS (
              SELECT domain,
                     CAST(length(domain) % 7 * 5 AS INT) AS cap
              FROM (SELECT DISTINCT domain FROM d)
            )
            SELECT d.doc_id, d.domain,
                   CAST(row_number() OVER (
                     PARTITION BY d.domain
                     ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id
                   ) AS INT) AS rnk
            FROM d JOIN c USING (domain)
            QUALIFY rnk <= c.cap
        """,
        # global running sum over the canonical md5 order — the
        # single-window formulation the distributed prefix-sum must match
        "pack_assign": """
            WITH t AS (
              SELECT doc_id,
                     CAST(len(list_filter(string_split(text, ' '),
                                          x -> x <> '')) AS BIGINT)
                       AS n_tokens,
                     md5(CAST(doc_id AS VARCHAR)) AS k
              FROM documents
            )
            SELECT doc_id, n_tokens,
                   CAST(SUM(n_tokens) OVER (
                     ORDER BY k, doc_id ROWS UNBOUNDED PRECEDING
                   ) AS BIGINT) AS cum_tokens,
                   CAST((SUM(n_tokens) OVER (
                     ORDER BY k, doc_id ROWS UNBOUNDED PRECEDING
                   ) - n_tokens) // 512 AS BIGINT) AS pack_id
            FROM t
        """,
        # ordered string_agg over the same naive global-window packing
        "pack_texts": """
            WITH t AS (
              SELECT doc_id, text,
                     CAST(len(list_filter(string_split(text, ' '),
                                          x -> x <> '')) AS BIGINT)
                       AS n_tokens,
                     md5(CAST(doc_id AS VARCHAR)) AS k
              FROM documents
            ), a AS (
              SELECT doc_id, text, n_tokens, k,
                     SUM(n_tokens) OVER (
                       ORDER BY k, doc_id ROWS UNBOUNDED PRECEDING
                     ) AS cum,
                     (SUM(n_tokens) OVER (
                       ORDER BY k, doc_id ROWS UNBOUNDED PRECEDING
                     ) - n_tokens) // 512 AS pack_id
              FROM t
            )
            SELECT CAST(pack_id AS BIGINT) AS pack_id,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
                   string_agg(text, chr(10) || chr(10)
                              ORDER BY cum, k, doc_id) AS pack_text
            FROM a GROUP BY pack_id
        """,
        # domain = the synthesized url host, straight from the shared
        # arithmetic — checks the url build -> parse_url roundtrip
        "domain_stats": f"""
            SELECT {R.HOST} AS domain,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(length(text)) AS BIGINT) AS total_chars
            FROM documents GROUP BY 1
        """,
        # per-domain cap by md5(doc_id) order — identical strings sort
        # identically in both engines, doc_id breaks (impossible) ties
        "domain_balance": f"""
            WITH d AS (
              SELECT doc_id, {R.HOST} AS domain FROM documents
            )
            SELECT doc_id, domain,
                   CAST(row_number() OVER (
                     PARTITION BY domain
                     ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS INT) AS rnk
            FROM d
            QUALIFY rnk <= 20
        """,
        # top-k vocab with (count desc, token) tie-break is deterministic
        # and identical cross-engine; oov_rate stays a raw IEEE division
        "oov_rate": """
            WITH toks AS (
              SELECT doc_id,
                     unnest(list_filter(string_split(lower(text), ' '),
                                        t -> t <> '')) AS tok
              FROM documents
            ), cnt AS (
              SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok
            ), vocab AS (
              SELECT tok FROM cnt ORDER BY n DESC, tok LIMIT 1000
            ), per AS (
              SELECT t.doc_id,
                     COUNT(*) AS nt,
                     SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS no
              FROM toks t LEFT JOIN vocab v ON v.tok = t.tok
              GROUP BY t.doc_id
            )
            SELECT d.doc_id,
                   CAST(COALESCE(p.nt, 0) AS BIGINT) AS n_tokens,
                   CAST(COALESCE(p.no, 0) AS BIGINT) AS n_oov,
                   CASE WHEN COALESCE(p.nt, 0) = 0 THEN NULL
                        ELSE CAST(p.no AS DOUBLE) / p.nt END AS oov_rate
            FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id
        """,
        # quality + lang + dedup-survivor composition over the augmented
        # corpus; lid scores the SAME augmented rows the Spark pass sees
        "clean_corpus": f"""
            WITH aug AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + {DOC_AUG_OFFSET} AS doc_id, text
              FROM documents WHERE doc_id % {DOC_AUG_STEP} = 0
            ), lid AS (
              SELECT * FROM ({_lang_id_oracle(src="aug")})
            ), f AS (
              SELECT a.doc_id, a.text
              FROM aug a JOIN lid ON lid.doc_id = a.doc_id
              WHERE length(a.text) >= 100
                AND len(string_split(a.text, ' ')) >= 20
                AND lid.pred_lang = 'en'
            )
            SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id,
                   md5(text) AS text_md5,
                   CAST(COUNT(*) AS BIGINT) AS n_copies
            FROM f GROUP BY md5(text)
        """,
        # exact integer totals + quantile_cont (bit-parity with Spark
        # percentile, rounded 4dp like events_user_stats)
        "profile": f"""
            WITH aug AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + {DOC_AUG_OFFSET} AS doc_id, text
              FROM documents WHERE doc_id % {DOC_AUG_STEP} = 0
            )
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(CASE WHEN length(text) = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_empty,
                   CAST(SUM(length(text)) AS BIGINT) AS total_chars,
                   CAST(SUM(len(list_filter(string_split(text, ' '),
                                            x -> x <> ''))) AS BIGINT)
                     AS total_words,
                   ROUND(quantile_cont(length(text), 0.5), 4) AS p50_chars,
                   ROUND(quantile_cont(length(text), 0.95), 4) AS p95_chars,
                   CAST(COUNT(DISTINCT md5(text)) AS BIGINT)
                     AS n_distinct_texts
            FROM aug
        """,
        # split rule + shingle sets + membership join, all relational;
        # rate is a raw IEEE division of exact counts
        "contamination": f"""
            WITH spl AS (
              SELECT doc_id, text,
                     CASE WHEN substr(md5(text), 1, 8)
                               < '{textops.SPLIT_BOUNDS[0][1]}'
                            THEN '{textops.SPLIT_BOUNDS[0][0]}'
                          WHEN substr(md5(text), 1, 8)
                               < '{textops.SPLIT_BOUNDS[1][1]}'
                            THEN '{textops.SPLIT_BOUNDS[1][0]}'
                          ELSE 'train' END AS split
              FROM documents
            ), shng AS (
              SELECT doc_id, split,
                     CASE WHEN length(text) >= 5 THEN
                       list_distinct(list_transform(
                         range(0, length(text) - 4),
                         i -> substr(text, i + 1, 5)))
                     ELSE [] END AS s
              FROM spl
            ), ev AS (
              SELECT DISTINCT sh FROM (
                SELECT unnest(s) AS sh FROM shng WHERE split = 'test'
              )
            ), trx AS (
              SELECT doc_id, unnest(s) AS sh FROM shng
              WHERE split <> 'test'
            ), hit AS (
              SELECT sh, 1 AS h FROM ev
            ), per AS (
              SELECT doc_id,
                     CAST(COUNT(*) AS BIGINT) AS n_shingles,
                     CAST(SUM(COALESCE(h, 0)) AS BIGINT) AS n_hits
              FROM trx LEFT JOIN hit USING (sh)
              GROUP BY doc_id
            )
            SELECT s.doc_id,
                   COALESCE(p.n_shingles, 0) AS n_shingles,
                   COALESCE(p.n_hits, 0) AS n_hits,
                   CASE WHEN COALESCE(p.n_shingles, 0) = 0 THEN NULL
                        ELSE CAST(p.n_hits AS DOUBLE)
                             / CAST(p.n_shingles AS DOUBLE) END
                     AS contamination_rate
            FROM spl s LEFT JOIN per p ON p.doc_id = s.doc_id
            WHERE s.split <> 'test'
        """,
        # expected canonical form straight from the synthesis arithmetic
        # (independent of the normalizer's implementation)
        "canonical_url": f"""
            SELECT doc_id,
                   {_messy_url_expr()} AS url,
                   'https://' || ({R.HOST}) || '/p/'
                     || CAST(doc_id AS STRING)
                     || CASE WHEN doc_id % 3 = 0 THEN '?ref=1' ELSE '' END
                     AS canonical_url
            FROM documents
        """,
        # unigram LM score: identical fixed-point micro-nat arithmetic
        # (floor(ln(count/total) * 1e6) as BIGINT, OOV = ln(1/total));
        # the per-doc SUM is integer -> order-independent both engines
        "lm_score": """
            WITH toks AS (
              SELECT doc_id, tok FROM (
                SELECT doc_id,
                       unnest(list_filter(string_split(lower(text), ' '),
                                          x -> x <> '')) AS tok
                FROM documents
              )
            ), cnt AS (
              SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok
            ), tot AS (
              SELECT CAST(SUM(c) AS DOUBLE) AS t FROM cnt
            ), lp AS (
              SELECT tok,
                     CAST(floor(ln(CAST(c AS DOUBLE) / t) * 1000000)
                          AS BIGINT) AS lp
              FROM cnt, tot
            ), per AS (
              SELECT k.doc_id,
                     CAST(COUNT(*) AS BIGINT) AS n_tokens,
                     CAST(SUM(COALESCE(lp.lp,
                       (SELECT CAST(floor(ln(1.0 / t) * 1000000) AS BIGINT)
                        FROM tot))) AS BIGINT) AS sum_lp_micro
              FROM toks k LEFT JOIN lp ON lp.tok = k.tok
              GROUP BY k.doc_id
            )
            SELECT d.doc_id,
                   COALESCE(p.n_tokens, 0) AS n_tokens,
                   COALESCE(p.sum_lp_micro, 0) AS sum_lp_micro,
                   CASE WHEN COALESCE(p.n_tokens, 0) = 0 THEN NULL
                        ELSE -CAST(p.sum_lp_micro AS DOUBLE)
                             / (CAST(p.n_tokens AS DOUBLE) * 1000000)
                        END AS mean_neg_logprob
            FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id
        """,
        # the five-stage cleaning pass rebuilt relationally: augment
        # (copies keyed to originals + PII keyed on the ORIGINAL id),
        # scrub, lang-score the SCRUBBED text, repetition gate, dedup
        "clean_corpus_full": f"""
            WITH base AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + {DOC_AUG_OFFSET} AS doc_id, text
              FROM documents WHERE doc_id % {DOC_AUG_STEP} = 0
            ), aug AS (
              SELECT doc_id,
                     {_pii_aug_expr(f"(doc_id % {DOC_AUG_OFFSET})")} AS text
              FROM base
            ), sq1 AS (
              SELECT doc_id, text,
                     regexp_replace(text,
                       '{textops.PII_EMAIL_RE}', '<EMAIL>', 'g') AS t1
              FROM aug
            ), sq2 AS (
              SELECT doc_id, text, t1,
                     regexp_replace(t1,
                       '{textops.PII_IPV4_RE}', '<IP>', 'g') AS t2
              FROM sq1
            ), scr AS (
              -- sequential counting: each pattern counted on the text
              -- after the prior replacements (== placeholders emitted)
              SELECT doc_id,
                     regexp_replace(t2,
                       '{textops.PII_PHONE_RE}', '<PHONE>', 'g') AS text,
                     CAST(len(regexp_extract_all(text,
                            '{textops.PII_EMAIL_RE}'))
                        + len(regexp_extract_all(t1,
                            '{textops.PII_IPV4_RE}'))
                        + len(regexp_extract_all(t2,
                            '{textops.PII_PHONE_RE}')) AS BIGINT) AS n_pii
              FROM sq2
            ), lid AS (
              SELECT * FROM ({_lang_id_oracle(src="scr")})
            ), wrd AS (
              SELECT doc_id,
                     list_filter(string_split(lower(text), ' '),
                                 x -> x <> '') AS w
              FROM scr
            ), topw AS (
              SELECT doc_id, max(c) AS top_w FROM (
                SELECT doc_id, tok, COUNT(*) AS c FROM (
                  SELECT doc_id, unnest(w) AS tok FROM wrd
                ) GROUP BY doc_id, tok
              ) GROUP BY doc_id
            ), f AS (
              SELECT s.doc_id, s.text, s.n_pii
              FROM scr s
              JOIN lid ON lid.doc_id = s.doc_id
              JOIN wrd ON wrd.doc_id = s.doc_id
              JOIN topw t ON t.doc_id = s.doc_id
              WHERE length(s.text) >= 100
                AND len(string_split(s.text, ' ')) >= 20
                AND lid.pred_lang = 'en'
                AND len(wrd.w) > 0
                AND CAST(t.top_w AS DOUBLE) / CAST(len(wrd.w) AS DOUBLE)
                    <= 0.15
            )
            SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id,
                   md5(text) AS clean_md5,
                   CAST(COUNT(*) AS BIGINT) AS n_copies,
                   CAST(MIN(n_pii) AS BIGINT) AS n_pii
            FROM f GROUP BY md5(text)
        """,
        "events_rollup": """
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                     AS sum_value,
                   CAST(MAX(user_id) AS BIGINT) AS max_user
            FROM events GROUP BY 1, 2
        """,
        "events_user_stats": """
            SELECT event_type,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
                   ROUND(quantile_cont(value, 0.5), 4) AS p50_value,
                   ROUND(quantile_cont(value, 0.95), 4) AS p95_value
            FROM events GROUP BY 1
        """,
        # all float inputs are exact BIGINT sums -> identical IEEE
        # mean/var/z expressions on both engines
        "rate_anomalies": """
            WITH hourly AS (
              SELECT event_type, date_trunc('hour', ts) AS hour,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ), stats AS (
              SELECT event_type,
                     CAST(COUNT(*) AS BIGINT) AS k,
                     CAST(SUM(n) AS BIGINT) AS s1,
                     CAST(SUM(n * n) AS BIGINT) AS s2
              FROM hourly GROUP BY 1
            )
            SELECT h.event_type, h.hour, h.n,
                   CASE WHEN sqrt(greatest(CAST(s.s2 AS DOUBLE) / s.k
                                  - (CAST(s.s1 AS DOUBLE) / s.k)
                                    * (CAST(s.s1 AS DOUBLE) / s.k), 0.0)) > 0
                        THEN (CAST(h.n AS DOUBLE)
                              - CAST(s.s1 AS DOUBLE) / s.k)
                             / sqrt(greatest(CAST(s.s2 AS DOUBLE) / s.k
                                    - (CAST(s.s1 AS DOUBLE) / s.k)
                                      * (CAST(s.s1 AS DOUBLE) / s.k), 0.0))
                        END AS zscore,
                   CASE WHEN abs(COALESCE(
                          CASE WHEN sqrt(greatest(CAST(s.s2 AS DOUBLE) / s.k
                                         - (CAST(s.s1 AS DOUBLE) / s.k)
                                           * (CAST(s.s1 AS DOUBLE) / s.k),
                                         0.0)) > 0
                               THEN (CAST(h.n AS DOUBLE)
                                     - CAST(s.s1 AS DOUBLE) / s.k)
                                    / sqrt(greatest(
                                           CAST(s.s2 AS DOUBLE) / s.k
                                           - (CAST(s.s1 AS DOUBLE) / s.k)
                                             * (CAST(s.s1 AS DOUBLE) / s.k),
                                           0.0))
                               END, 0.0)) > 3.0
                        THEN 1 ELSE 0 END AS is_anomaly
            FROM hourly h JOIN stats s ON s.event_type = h.event_type
        """,
        "fingerprint": r"""
            SELECT doc_id,
                   md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
            FROM documents
        """,
        "simhash": _simhash_oracle(),
        # exhaustive all-pairs Jaccard: a green row proves the Spark LSH's
        # recall is 1.0 on the gate data, not merely candidate correctness
        "minhash_neardup": f"""
            WITH {_MINHASH_CTE_BODY}
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                         / len(list_distinct(list_concat(a.s, b.s))), 4) AS jaccard
            FROM shn a JOIN shn b
              ON b.doc_id > a.doc_id
             AND least(a.ns, b.ns) >= 0.6 * greatest(a.ns, b.ns)
            WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                  / len(list_distinct(list_concat(a.s, b.s))) >= 0.6
        """,
        # connected components over the SAME exhaustive pair set, computed
        # by transitive closure (recursive CTE) — checks the Spark
        # label-propagation loop end-to-end incl. singleton handling
        "neardup_components": f"""
            WITH RECURSIVE {_MINHASH_CTE_BODY}, pr AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM shn a JOIN shn b
                ON b.doc_id > a.doc_id
               AND least(a.ns, b.ns) >= 0.6 * greatest(a.ns, b.ns)
              WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                    / len(list_distinct(list_concat(a.s, b.s))) >= 0.6
            ), edges AS (
              SELECT doc_a AS u, doc_b AS v FROM pr
              UNION ALL
              SELECT doc_b AS u, doc_a AS v FROM pr
            ), reach(src, dst) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT r.src, e.v FROM reach r JOIN edges e ON e.u = r.dst
            )
            SELECT src AS doc_id,
                   CAST(MIN(dst) AS BIGINT) AS component_id,
                   CAST(CASE WHEN MIN(dst) = src THEN 1 ELSE 0 END AS INT)
                     AS is_canonical
            FROM reach GROUP BY src
        """,
        # structural invariants of the real WAV encode->decode roundtrip
        "audio_meta": """
            SELECT doc_id,
                   CAST(44 + 2 * (8000 + doc_id % 1000) AS BIGINT) AS byte_len,
                   CAST(16000 AS INT) AS sample_rate,
                   CAST(8000 + doc_id % 1000 AS BIGINT) AS n_samples,
                   CAST(8000 + doc_id % 1000 AS DOUBLE) / 16000 AS duration_sec
            FROM documents
        """,
        # identical keep-rule (min words, terminal punct, ban list) in
        # DuckDB list lambdas over the same line augmentation
        "line_filter": f"""
            WITH aug AS (
              SELECT doc_id, {LINE_AUG_EXPR} AS text FROM documents
            ), l AS (
              SELECT doc_id, string_split(text, chr(10)) AS ls FROM aug
            ), k AS (
              SELECT doc_id, ls,
                     list_filter(ls, x ->
                       len(list_filter(string_split(x, ' '),
                                       w -> w <> '')) >= 3
                       AND substr(x, -1, 1) IN ('.', '!', '?')
                       AND NOT contains(lower(x), 'lorem ipsum')
                       AND NOT contains(lower(x), 'javascript')) AS ks
              FROM l
            )
            SELECT doc_id,
                   -- array_to_string([]) is NULL in DuckDB but '' in
                   -- Spark's array_join: coalesce to the Spark value
                   COALESCE(array_to_string(ks, chr(10)), '')
                     AS clean_text,
                   CAST(len(ls) AS INT) AS n_lines,
                   CAST(len(ks) AS INT) AS n_kept
            FROM k
        """,
        # n-gram formation + count + tie-break rebuilt with DuckDB list
        # lambdas; QUALIFY rank gives the same deterministic top-k
        "ngram_topk": """
            WITH w AS (
              SELECT list_filter(string_split(lower(text), ' '),
                                 x -> x <> '') AS w
              FROM documents
            ), g AS (
              SELECT unnest(CASE WHEN len(w) >= 2 THEN
                       list_transform(range(0, len(w) - 1),
                         i -> array_to_string(w[i + 1 : i + 2], ' '))
                     ELSE [] END) AS ngram
              FROM w
            ), c AS (
              SELECT ngram, CAST(COUNT(*) AS BIGINT) AS n
              FROM g GROUP BY ngram
            )
            SELECT ngram, n FROM c
            QUALIFY row_number() OVER (ORDER BY n DESC, ngram) <= 100
        """,
        # suffix generation + membership rebuilt relationally; the url
        # and host come from the same synthesis arithmetic
        "url_filter": f"""
            WITH pages AS (
              SELECT doc_id, {R.URL} AS url,
                     lower(regexp_extract({R.URL},
                       '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1)) AS host
              FROM documents
            ), bl(domain) AS (
              VALUES ('db-03.example.com'), ('example.net'), ('node-3.example.net')
            ), sfx AS (
              SELECT doc_id,
                     unnest(list_transform(
                       range(0, len(string_split(host, '.'))),
                       i -> array_to_string(
                         string_split(host, '.')[i + 1:], '.'))) AS domain
              FROM pages
            ), hits AS (
              SELECT s.doc_id,
                     arg_max(s.domain, length(s.domain)) AS matched_domain
              FROM sfx s JOIN bl b ON b.domain = s.domain
              GROUP BY s.doc_id
            )
            SELECT p.doc_id, p.url, p.host,
                   CAST(CASE WHEN h.matched_domain IS NOT NULL
                        THEN 1 ELSE 0 END AS INT) AS blocked,
                   h.matched_domain
            FROM pages p LEFT JOIN hits h ON h.doc_id = p.doc_id
        """,
        # first-occurrence survival stated with a QUALIFY window +
        # ordered string_agg (the oracle may use the hot-window form
        # the Spark op deliberately avoids)
        "line_dedup": f"""
            WITH aug AS (
              SELECT doc_id, {LINE_AUG_EXPR} AS text FROM documents
            ), sp AS (
              SELECT doc_id, text, string_split(text, chr(10)) AS ls
              FROM aug
            ), l AS (
              SELECT doc_id, unnest(range(len(ls))) AS pos,
                     unnest(ls) AS ln
              FROM sp
            ), k AS (
              SELECT doc_id, pos, ln FROM l
              QUALIFY row_number()
                OVER (PARTITION BY ln ORDER BY doc_id, pos) = 1
            ), reb AS (
              SELECT doc_id,
                     string_agg(ln, chr(10) ORDER BY pos) AS clean_text,
                     COUNT(*) AS n_kept
              FROM k GROUP BY doc_id
            )
            SELECT s.doc_id,
                   COALESCE(r.clean_text, '') AS clean_text,
                   CAST(len(s.ls) AS INT) AS n_lines,
                   CAST(COALESCE(r.n_kept, 0) AS INT) AS n_kept
            FROM sp s LEFT JOIN reb r ON r.doc_id = s.doc_id
        """,
        # relational rebuild: distinct per-doc shingles -> per-shingle
        # document counts -> per-doc dup fraction
        "dup_passages": f"""
            WITH base AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + {DOC_AUG_OFFSET} AS doc_id, text
              FROM documents WHERE doc_id % {DOC_AUG_STEP} = 0
            ), sh AS (
              SELECT doc_id, unnest(list_distinct(CASE
                       WHEN length(text) >= 20 THEN
                         list_transform(range(0, length(text) - 19),
                                        i -> substring(text, i + 1, 20))
                       ELSE [] END)) AS sh
              FROM base
            ), cnt AS (
              SELECT sh, COUNT(*) AS nd FROM sh GROUP BY sh
            ), per AS (
              SELECT s.doc_id,
                     COUNT(*) AS n_shingles,
                     SUM(CASE WHEN c.nd > 1 THEN 1 ELSE 0 END) AS n_dup
              FROM sh s JOIN cnt c ON c.sh = s.sh
              GROUP BY s.doc_id
            )
            SELECT b.doc_id,
                   CAST(COALESCE(p.n_shingles, 0) AS BIGINT) AS n_shingles,
                   CAST(COALESCE(p.n_dup, 0) AS BIGINT) AS n_dup,
                   CASE WHEN COALESCE(p.n_shingles, 0) = 0 THEN NULL
                        ELSE CAST(p.n_dup AS DOUBLE)
                             / CAST(p.n_shingles AS DOUBLE)
                   END AS dup_rate
            FROM base b LEFT JOIN per p ON p.doc_id = b.doc_id
        """,
        # expected extraction stated from synthesis arithmetic (title
        # text survives tag-strip; entities decode; script/style/
        # comment content vanishes) — independent of the Spark regexes
        "html_extract": """
            SELECT doc_id,
                   't' || text || '& tail <'
                       || CAST(doc_id % 10 AS VARCHAR) || '>'
                     AS extracted_text
            FROM documents
        """,
        # same winnowing scheme in DuckDB list lambdas: k-gram md5-hex
        # prefixes, lexicographic window minima (1-based inclusive list
        # slices l[a:b] == Spark's slice(l, a, w))
        "winnow": """
            WITH g AS (
              SELECT doc_id,
                     CASE WHEN length(text) >= 5 THEN
                       list_transform(range(0, length(text) - 4),
                         i -> substr(md5(substring(text, i + 1, 5)), 1, 12))
                     ELSE [] END AS gs
              FROM documents
            ), wnd AS (
              SELECT doc_id, gs,
                     CASE WHEN len(gs) >= 4 THEN
                       list_transform(range(0, len(gs) - 3),
                         j -> list_aggregate(gs[j + 1 : j + 4], 'min'))
                     ELSE [] END AS ws
              FROM g
            )
            SELECT doc_id,
                   CAST(len(gs) AS INT) AS n_grams,
                   CAST(len(list_distinct(ws)) AS INT) AS n_fps,
                   COALESCE(array_to_string(
                     list_sort(list_distinct(ws)), ','), '') AS fp_csv
            FROM wnd
        """,
        # image payloads are pure doc_id arithmetic (synth_ppm), so the
        # oracle recomputes dimensions + exact P6 byte accounting
        # (header "P6\\n{w} {h}\\n255\\n" + 3wh raster); mean/std of the
        # decoded raster are pytest-covered against numpy
        "image_meta": """
            WITH dims AS (
              SELECT doc_id,
                     8 + doc_id % 25 AS w,
                     6 + doc_id % 17 AS h
              FROM documents
            )
            SELECT doc_id,
                   CAST(9 + length(CAST(w AS VARCHAR))
                          + length(CAST(h AS VARCHAR))
                          + 3 * w * h AS BIGINT) AS byte_len,
                   CAST(w AS INT) AS width,
                   CAST(h AS INT) AS height,
                   CAST(3 AS INT) AS channels
            FROM dims
        """,
        "ann_topk": _ann_topk_oracle(),
        # lsh_topk / ivf_topk: gate params are tuned for recall 1.0 at
        # sf0.01 (LSH_GATE / IVF_GATE above), so the EXACT top-k oracle
        # applies verbatim — a green row proves candidate generation lost
        # nothing. Was `no_oracle` in r2 (the last two non-green rows).
        "lsh_topk": _ann_topk_oracle(),
        "ivf_topk": _ann_topk_oracle(),
        "embedding_neardup": _embedding_neardup_oracle(),
        "json_serialize": _json_oracle(),
        "ngram_jaccard": """
            WITH sh AS (
              SELECT doc_id,
                     list_distinct(CASE WHEN length(text) >= 5
                       THEN list_transform(range(0, length(text) - 4),
                                           i -> substr(text, i + 1, 5))
                       ELSE [] END) AS s
              FROM documents
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                         / len(list_distinct(list_concat(a.s, b.s))),
                         4) AS jaccard
            FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
        """,
    }
    # the two-phase skew-safe operator and the built-in session_window
    # twin have identical semantics — same oracle
    out["sessionize_scaled"] = out["sessionize"]
    out["sessionize_native"] = out["sessionize"]
    # per-group and single-pass grok must produce IDENTICAL output
    out["grok_line"] = _grok_line_oracle()
    out["grok_line_sp"] = out["grok_line"]
    # the Tungsten fast-path parser must be byte-identical to the Python
    # path on every axis the driver checks — same oracles, new rows
    out["parse_fields_jvm"] = out["parse_fields"]
    out["msg_byte_identity_jvm"] = out["msg_byte_identity"]
    out["rejects_jvm"] = out["rejects"]
    return out
