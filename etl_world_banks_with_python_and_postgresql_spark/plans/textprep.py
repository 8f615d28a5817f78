"""Text analysis + training-prep surface: token/quality/lang-id/
fingerprint scoring, decontamination, splits, packing, sampling,
corpus pipelines.

Split from the monolithic plans/queries.py (round 5, VERDICT r4
task #7); registration order is irrelevant -- every consumer
sorts REGISTRY by name. Helpers and SQL twins live in
plans.base.
"""

from .base import *  # noqa: F401,F403 -- registry, helpers, spark/operator imports



@query(
    "q34_text_tokens",
    oracle=f"""
SELECT doc_id,
       CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len({_TOKENS_SQL}) END AS n_tokens,
       length(text) AS n_chars_measured,
       {_ratio_sql(f"list_sum([length(x) for x in {_TOKENS_SQL}])",
                   f"greatest(len({_TOKENS_SQL}), 1)", 4)} AS avg_token_len
FROM documents
""",
    description="token counting (whitespace tokenizer) + length stats",
)
def q34(spark, sf_dir):
    return text.with_token_stats(load(spark, "documents", sf_dir))


@query(
    "q35_text_quality",
    oracle=f"""
WITH t AS (SELECT doc_id, text, {_TOKENS_SQL} AS toks FROM documents)
SELECT doc_id,
       length(text)::INT AS n_chars_measured,
       (CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(toks) END)::INT AS n_tokens,
       {_ratio_sql("len(regexp_extract_all(text, '[.,!?;:]'))",
                   "greatest(length(text), 1)")} AS punct_ratio,
       {_ratio_sql("len(list_filter(toks, w -> list_contains("
                   "['the','a','of','and','to','in','is','that'], w)))",
                   "greatest(len(toks), 1)")} AS stopword_ratio,
       {text.QUALITY_MICROS_SQL.format(t="text")} / 1000000.0 AS quality_score
FROM t
""",
    description="quality scoring: length/punct/stopword ratios + composite",
)
def q35(spark, sf_dir):
    return text.with_quality(load(spark, "documents", sf_dir))


@query(
    "q36_text_langid",
    oracle=_langid_oracle(),
    description="n-gram/stopword-heuristic language identification",
)
def q36(spark, sf_dir):
    return text.with_lang_id(load(spark, "documents", sf_dir))


@query(
    "q37_text_fingerprint",
    oracle=f"""
SELECT doc_id,
       {_POLY_SQL.format(x="substring(trim(lower(text)), 1, 64)")} AS fingerprint
FROM documents
""",
    description="polynomial rolling-hash document fingerprint (prefix 64)",
)
def q37(spark, sf_dir):
    return text.with_fingerprint(load(spark, "documents", sf_dir))


@query(
    "q61_top_tokens",
    oracle=f"""
SELECT token, count(*) AS n FROM (
  SELECT unnest({_TOKENS_SQL}) AS token FROM documents)
GROUP BY token ORDER BY n DESC, token LIMIT 20
""",
    description="explode (flatten) token arrays + global top-k",
)
def q61(spark, sf_dir):
    from ..functions.xhash import ws_tokens

    docs = load(spark, "documents", sf_dir)
    return (
        docs.select(F.explode(ws_tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(20)
    )


@query(
    "q91_array_funcs",
    oracle="""
WITH e AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM embeddings)
SELECT vec_id,
       len(v)::INT                                   AS dim,
       round(sqrt(list_dot_product(v, v)), 6)        AS l2_norm,
       round(list_max(v), 6)                         AS vmax,
       round(list_min(v), 6)                         AS vmin,
       round(list_sum(v[1:8]), 6)                    AS head_sum,
       round(list_sum([abs(x) for x in v]), 6)       AS l1_norm
FROM e
""",
    description="array function family: size/min/max/slice/transform/aggregate",
)
def q91(spark, sf_dir):
    emb = load(spark, "embeddings", sf_dir)
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(v, v, lambda a, b: a * b), F.lit(0.0), lambda s, x: s + x)
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.sqrt(dot), 6).alias("l2_norm"),
        F.round(F.array_max(v), 6).alias("vmax"),
        F.round(F.array_min(v), 6).alias("vmin"),
        F.round(
            F.aggregate(F.slice(v, 1, 8), F.lit(0.0), lambda s, x: s + x), 6
        ).alias("head_sum"),
        F.round(
            F.aggregate(F.transform(v, lambda x: F.abs(x)), F.lit(0.0), lambda s, x: s + x),
            6,
        ).alias("l1_norm"),
    )


@query(
    "q11_hash_split",
    oracle=f"""
WITH h AS (
  SELECT doc_id, n_chars,
         {_POLY_SQL.format(x="md5(text)")} % 100 AS bucket
  FROM documents)
SELECT CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'valid'
            ELSE 'test' END AS split,
       count(*) AS n_docs,
       {_ratio_sql("sum(n_chars)", "count(n_chars)", 4)} AS avg_chars
FROM h GROUP BY 1
""",
    description=(
        "deterministic content-hash train/valid/test split (80/10/10): "
        "bucket = poly_hash(md5(text)) %% 100 -- stable across engines and "
        "reshuffles, equal texts land in the same split"
    ),
)
def q11(spark, sf_dir):
    from ..operators.train_prep import hash_split

    return (
        hash_split(load(spark, "documents", sf_dir))
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            # exact-BIGINT HALF_UP mean (q49 determinism rule): no double
            # is ever rounded, so the value is engine-exact by construction
            (
                exactnum.ratio_scaled_halfup(
                    F.sum("n_chars"), F.count("n_chars"), 4
                )
                / F.lit(10000.0)
            ).alias("avg_chars"),
        )
    )


@query(
    "q70_pack_token_bins",
    oracle=f"""
WITH t AS (
  SELECT source, doc_id,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len({_TOKENS_SQL}) END AS n_tokens
  FROM documents),
c AS (
  SELECT source, doc_id, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM t)
SELECT source, floor((cum - n_tokens) / 2048)::BIGINT AS bin_id,
       count(*) AS n_docs, sum(n_tokens) AS total_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM c GROUP BY source, bin_id
""",
    description=(
        "pretraining sequence packing: greedy per-source token bins of "
        "2048 (cumsum window partitioned by source shard -- no global "
        "single-partition window at scale)"
    ),
)
def q70(spark, sf_dir):
    from ..operators.train_prep import pack_token_bins

    return pack_token_bins(load(spark, "documents", sf_dir), budget=2048)


@query(
    "q76_weighted_sample",
    oracle=f"""
WITH w AS (
  SELECT source, doc_id,
         {_POLY_SQL.format(x="md5(text)")} % 10000 AS bucket,
         CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
              THEN 0.3 ELSE 0.9 END AS wt
  FROM documents)
SELECT source, count(*) AS n_kept
FROM w WHERE bucket < CAST(wt * 10000 AS BIGINT)
GROUP BY source
""",
    description=(
        "corpus mixing: deterministic per-source Bernoulli sampling "
        "(keep 30% of even-numbered sources, 90% of odd) gated on a "
        "content hash -- reproducible across engines/reshuffles, equal "
        "texts kept or dropped together"
    ),
)
def q76(spark, sf_dir):
    from ..operators.train_prep import weighted_sample

    docs = load(spark, "documents", sf_dir)
    # weight as a pure row expression -- no driver collect, no action in
    # the plan build (round-2 advice: the distinct+collect was bounded but
    # unnecessary)
    wt = F.when(
        F.substring("source", 4, 10).cast("int") % 2 == 0, F.lit(0.3)
    ).otherwise(F.lit(0.9))
    return (
        weighted_sample(docs, wt)
        .groupBy("source")
        .agg(F.count("*").alias("n_kept"))
    )


@query(
    "q79_text_bpe_tokens",
    oracle=f"""
SELECT doc_id,
       CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len({_TOKENS_SQL}) END AS ws_tokens,
       len(regexp_extract_all(text,
           ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\r]+'))::INT AS bpe_tokens,
       {_BPE_RATIO_SQL} AS chars_per_token
FROM documents
""",
    description=(
        "BPE-style pre-tokenization counts (GPT-2-shape regex, lookahead-"
        "free so Java regex and RE2 count identical matches) + "
        "chars-per-token corpus sizing ratio"
    ),
)
def q79(spark, sf_dir):
    return text.with_bpe_stats(load(spark, "documents", sf_dir))


@query(
    "q48_decontaminate",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, source, {_TOKENS_SQL} AS t FROM documents),
grams AS (
  SELECT doc_id, source, array_to_string(t[i:i+7], ' ') AS gram
  FROM tok, UNNEST(generate_series(1, len(t)-8+1)) AS g(i)),
ev AS (SELECT DISTINCT gram FROM grams WHERE source = 'src0')
SELECT g.doc_id, count(DISTINCT g.gram) AS n_shared_grams
FROM grams g JOIN ev USING (gram)
WHERE g.source <> 'src0'
GROUP BY 1
""",
    description=(
        "benchmark decontamination: training docs (source<>src0) sharing "
        "any 8-word n-gram with the held-out eval corpus (source=src0). "
        "Eval gram set broadcasts; the explode inflation dies at the "
        "broadcast join, one doc-id groupBy"
    ),
)
def q48(spark, sf_dir):
    from ..operators.train_prep import ngram_contamination

    docs = load(spark, "documents", sf_dir)
    return ngram_contamination(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        n=8,
    )


@query(
    "q88_pii_redaction",
    oracle=f"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || doc_id::VARCHAR || '@example.com ref '
              || (1000000 + doc_id * 97)::VARCHAR AS t
  FROM documents),
e AS (
  SELECT doc_id, t,
         regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g') AS no_email
  FROM aug)
SELECT doc_id,
       len(regexp_extract_all(t, '{_EMAIL_RE}'))::INT AS n_emails,
       len(regexp_extract_all(no_email, '{_DIGIT_RUN_RE}'))::INT AS n_long_numbers,
       regexp_replace(no_email, '{_DIGIT_RUN_RE}', '<NUM>', 'g') AS redacted
FROM e
""",
    description=(
        "PII masking: emails then 6+ digit runs replaced with typed "
        "placeholders + per-row audit counters, over a deterministic "
        "synthetic contact line (the raw corpus has no PII, so the "
        "fixture column makes the check non-trivial). Pure regexp "
        "codegen, no Python"
    ),
)
def q88(spark, sf_dir):
    docs = load(spark, "documents", sf_dir)
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com ref "),
            (F.lit(1000000) + F.col("doc_id") * 97).cast("string"),
        ).alias("t"),
    )
    return text.redact_pii(aug, text_col="t").select(
        "doc_id", "n_emails", "n_long_numbers", "redacted"
    )


@query(
    "q95_stratified_take",
    oracle="""
SELECT doc_id, source
FROM (SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(text), doc_id) AS rn
      FROM documents)
WHERE rn <= 5
""",
    description=(
        "deterministic exact-count stratified sample: first 5 docs per "
        "source in content-hash order -- exact counts (unlike sampleBy) "
        "and selection stable across reruns/reshuffles/engines"
    ),
)
def q95(spark, sf_dir):
    from ..operators.train_prep import stratified_take

    return stratified_take(
        load(spark, "documents", sf_dir), n_per_group=5
    ).select("doc_id", "source")


@query(
    "q98_repetition_signals",
    oracle="""
WITH tok AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE string_split_regex(trim(lower(text)), '\\s+') END AS w
  FROM documents),
arrs AS (
  SELECT doc_id, w, len(w) AS n,
         [w[i] || ' ' || w[i+1] FOR i IN generate_series(1, len(w) - 1)] AS bg,
         [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
          FOR i IN generate_series(1, len(w) - 2)] AS tg
  FROM tok),
bgc AS (
  SELECT doc_id, g, count(*) AS c
  FROM (SELECT doc_id, unnest(bg) AS g FROM arrs)
  GROUP BY 1, 2),
bga AS (SELECT doc_id, max(c) AS m, sum(c) AS s FROM bgc GROUP BY 1)
SELECT a.doc_id,
       a.n::INT AS n_tokens,
       CASE WHEN a.n <= 0 THEN 0.0
            ELSE round(1.0 - len(list_distinct(a.w)) / a.n::DOUBLE, 4)
       END AS dup_token_frac,
       CASE WHEN len(a.tg) <= 0 THEN 0.0
            ELSE round(1.0 - len(list_distinct(a.tg)) / len(a.tg)::DOUBLE, 4)
       END AS dup_trigram_frac,
       coalesce(round(bga.m / bga.s::DOUBLE, 4), 0.0) AS top_bigram_frac
FROM arrs a LEFT JOIN bga USING (doc_id)
""",
    description=(
        "Gopher-style repetition quality gates: duplicate-token and "
        "duplicate-trigram fractions (per-row expressions, no shuffle) + "
        "top-bigram occurrence fraction (explode -> two map-side-combined "
        "aggs keyed by (doc, gram) then doc)"
    ),
)
def q98(spark, sf_dir):
    return text.with_repetition(load(spark, "documents", sf_dir))


@query(
    "z01_chunk_windows",
    oracle="""
WITH tok AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE string_split_regex(trim(lower(text)), '\\s+') END AS w
  FROM documents),
st AS (
  SELECT doc_id, w, len(w) AS n,
         list_filter(generate_series(0, len(w) - 1, 48),
                     s -> s = 0 OR s + 16 < len(w)) AS starts
  FROM tok WHERE len(w) > 0),
e AS (
  SELECT doc_id, (g.i - 1)::INT AS chunk_id, starts[g.i] AS s, n, w
  FROM st CROSS JOIN UNNEST(generate_series(1, len(starts))) g(i))
SELECT doc_id, chunk_id,
       s::INT AS start_token,
       least(64, n - s)::INT AS n_chunk_tokens,
       array_to_string(w[s + 1 : s + 64], ' ') AS chunk_text
FROM e
""",
    description=(
        "sliding token-window chunking (window=64, stride=48; overlap 16) "
        "for context-window prep: per-row sequence+slice+posexplode, "
        "map-only fan-out, no shuffle"
    ),
)
def z01(spark, sf_dir):
    from ..operators.train_prep import chunk_token_windows

    return chunk_token_windows(
        load(spark, "documents", sf_dir), window=64, stride=48
    )


@query(
    "z07_corpus_manifest",
    oracle=f"""
WITH q AS (
  SELECT source, text,
         (CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE len({_TOKENS_SQL}) END) AS n_tokens,
         {text.QUALITY_MICROS_SQL.format(t="text")} AS score_micros
  FROM documents)
SELECT source,
       count(*) AS n_docs,
       count(DISTINCT md5(text)) AS n_distinct_texts,
       sum(n_tokens)::BIGINT AS total_tokens,
       (sum(score_micros) // count(*))::BIGINT AS avg_quality_micros,
       sum(CASE WHEN n_tokens < 20 THEN 1 ELSE 0 END)::BIGINT AS n_short
FROM q GROUP BY source
""",
    description=(
        "per-source corpus manifest in one pass: doc/distinct-text/token "
        "counts, mean composite quality (exact integer micros -- the q49 "
        "determinism rule), short-doc tally -- the report a corpus owner "
        "reads before mixing sources (single scan, one map-side-combined "
        "aggregation)"
    ),
)
def z07(spark, sf_dir):
    from ..operators.text import _floordiv

    docs = load(spark, "documents", sf_dir)
    q = text.with_quality_micros(docs, keep_cols=["source", "text"])
    return (
        q.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct(F.md5("text")).alias("n_distinct_texts"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("score_micros").alias("sum_micros"),
            F.sum(F.when(F.col("n_tokens") < 20, 1).otherwise(0)).alias("n_short"),
        )
        .withColumn(
            "avg_quality_micros", _floordiv(F.col("sum_micros"), F.col("n_docs"))
        )
        .drop("sum_micros")
    )


@query(
    "z08_validate_quarantine",
    oracle="""
WITH v AS (
  SELECT doc_id,
         array_to_string(list_filter(
           [CASE WHEN NOT (n_chars >= 100) THEN 'min_length' END,
            CASE WHEN NOT (lang IN ('de', 'en', 'fr')) THEN 'supported_lang' END],
           x -> x IS NOT NULL), ',') AS failed
  FROM documents)
SELECT failed AS failed_rules, count(*) AS n
FROM v WHERE failed <> '' GROUP BY failed
""",
    description=(
        "rule-based ingestion quarantine audit: per violated-rule-set "
        "counts from validate_rows (named predicates, failed_rules audit "
        "column; good rows stay pushdown-friendly filters)"
    ),
)
def z08(spark, sf_dir):
    from ..sources.robust import validate_rows

    docs = load(spark, "documents", sf_dir)
    _good, quar = validate_rows(
        docs,
        {
            "min_length": F.col("n_chars") >= 100,
            "supported_lang": F.col("lang").isin("de", "en", "fr"),
        },
    )
    return quar.groupBy(
        F.array_join("failed_rules", ",").alias("failed_rules")
    ).agg(F.count("*").alias("n"))


@query(
    "z10_token_entropy",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
  FROM documents WHERE length(trim(text)) > 0),
c AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY 1, 2),
n AS (SELECT doc_id, sum(c) AS n FROM c GROUP BY 1)
SELECT c.doc_id,
       round(-sum((c.c / n.n::DOUBLE) * ln(c.c / n.n::DOUBLE)), 4) AS token_entropy,
       count(*) AS n_distinct_tokens
FROM c JOIN n USING (doc_id)
GROUP BY c.doc_id
""",
    description=(
        "Shannon entropy of the within-document token distribution (the "
        "low-entropy tail is boilerplate/degenerate text): explode -> two "
        "map-side-combined aggregations keyed by (doc, token) then doc"
    ),
)
def z10(spark, sf_dir):
    docs = load(spark, "documents", sf_dir).filter(
        F.length(F.trim("text")) > 0
    )
    c = (
        docs.select("doc_id", F.explode(xhash.ws_tokens(F.col("text"))).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
    )
    n = c.groupBy("doc_id").agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n").cast("double")
    return (
        c.join(n, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.round(-F.sum(p * F.log(p)), 4).alias("token_entropy"),
            F.count("*").alias("n_distinct_tokens"),
        )
    )


@query(
    "z11_canonical_dedup",
    oracle=f"""
WITH c AS (
  SELECT doc_id,
         md5(trim(regexp_replace(regexp_replace(
               translate(lower(text), '{text.ACCENT_SRC}', '{text.ACCENT_DST}'),
               '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))) AS h
  FROM documents)
SELECT h AS canon_hash, count(*) AS n_copies, min(doc_id) AS keep_id
FROM c GROUP BY h
""",
    description=(
        "exact dedup on the canonical text form (lowercase + shared-map "
        "accent fold + punctuation strip + whitespace collapse): one "
        "map-side-combined hash-groupBy, catches the variant copies "
        "byte-exact dedup misses"
    ),
)
def z11(spark, sf_dir):
    return text.canonical_dedup_groups(load(spark, "documents", sf_dir))


@query(
    "z13_deterministic_sample",
    oracle=f"""
SELECT doc_id, source, n_chars
FROM (SELECT doc_id, source, n_chars,
             {_POLY_SQL.format(x="md5('0' || text)")} AS sk
      FROM documents)
ORDER BY sk, doc_id
LIMIT 50
""",
    description=(
        "exact-size uniform corpus sample as a bottom-k sketch over a "
        "portable content hash: reproducible across engines/reshuffles/"
        "corpus growth (KMV min-wise property), executed as "
        "TakeOrderedAndProject -- per-partition k-row heaps, no global "
        "sort, the one-pass sampling shape a 100 TB corpus needs"
    ),
)
def z13(spark, sf_dir):
    from ..operators.train_prep import deterministic_sample

    docs = load(spark, "documents", sf_dir)
    return deterministic_sample(docs, 50).select("doc_id", "source", "n_chars")


@query(
    "z15_bloom_decontaminate",
    oracle=REGISTRY["q48_decontaminate"].oracle,
    description=(
        "q48's decontamination for the eval-set-too-big-to-broadcast "
        "regime: JVM-hashed Bloom prefilter (capped 128 KiB bit array "
        "broadcast, Arrow-batched vectorized probe) kills the explode "
        "inflation before any shuffle, then an exact SHUFFLE join against "
        "the eval gram set removes false positives -- result-identical to "
        "the exact operator (same oracle)"
    ),
)
def z15(spark, sf_dir):
    from ..operators.train_prep import bloom_decontaminate

    docs = load(spark, "documents", sf_dir)
    return bloom_decontaminate(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        n=8,
    )


@query(
    "z18_bigram_coherence",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, {_TOKENS_SQL} AS t FROM documents),
bg AS (
  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
  FROM tok, UNNEST(generate_series(1, len(t)-1)) AS s(i)),
c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
c1 AS (SELECT w1, sum(c12)::BIGINT AS c1 FROM c12 GROUP BY 1),
term AS (
  SELECT w1, w2, (c12 * 1000000) // c1 AS term
  FROM c12 JOIN c1 USING (w1)),
doc AS (
  SELECT bg.doc_id, count(*) AS n_bigrams, sum(term)::BIGINT AS s
  FROM bg JOIN term USING (w1, w2)
  GROUP BY 1)
SELECT d.doc_id,
       coalesce(n_bigrams, 0) AS n_bigrams,
       CASE WHEN coalesce(n_bigrams, 0) > 0 THEN s // n_bigrams
            ELSE 0 END AS coherence_ppm
FROM documents d LEFT JOIN doc USING (doc_id)
""",
    description=(
        "corpus-trained bigram-LM fluency score (the CCNet/KenLM "
        "perplexity-filter shape): per-doc integer mean of exact "
        "parts-per-million conditional probabilities c(w1,w2)/c(w1). "
        "Pure integer arithmetic end to end -- no float summation to go "
        "order-sensitive; bigram-type table built once with map-side "
        "combine, head counts derived from it, occurrences join on the "
        "gram key"
    ),
)
def z18(spark, sf_dir):
    return text.bigram_coherence(load(spark, "documents", sf_dir))


@query(
    "z20_quality_classifier",
    oracle=f"""
WITH tok AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len({_TOKENS_SQL}) END AS n_tokens,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE list_sum(list_transform({_TOKENS_SQL},
                   s -> {xhash.MD5_HASH32_SQL.format(x='s')} % 2001 - 1000))
         END::BIGINT AS weight_sum
  FROM documents)
SELECT doc_id, n_tokens, weight_sum,
       CASE WHEN n_tokens > 0 THEN weight_sum * 10 // n_tokens
            ELSE 0 END::BIGINT AS score_bp,
       weight_sum > 0 AS accept
FROM tok
""",
    description=(
        "hashed-bag-of-words linear quality classifier (fastText/DSIR "
        "filter shape, hash-derived integer weights standing in for the "
        "learned table): exact BIGINT weight sums -- no float "
        "accumulation, partition-order- and engine-independent; pure "
        "scan-speed projection, zero shuffles/UDFs"
    ),
)
def z20(spark, sf_dir):
    return text.hashed_linear_score(load(spark, "documents", sf_dir))


@query(
    "z22_source_overlap",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, source, {_TOKENS_SQL} AS t FROM documents),
g AS (
  SELECT DISTINCT source AS src, array_to_string(t[i:i+7], ' ') AS gram
  FROM tok, UNNEST(generate_series(1, len(t)-8+1)) AS s(i))
SELECT a.src AS src_a, b.src AS src_b, count(*) AS shared_grams
FROM g a JOIN g b ON a.gram = b.gram AND a.src < b.src
GROUP BY 1, 2
""",
    description=(
        "cross-source contamination matrix: distinct shared 8-gram counts "
        "per unordered source pair (which corpus slices duplicate each "
        "other / leak eval content). No gram self-join on the Spark side: "
        "each gram folds to its sorted source SET (bounded by |sources|, "
        "not corpus size) and pairs are generated by pure array "
        "expressions; the oracle is the equivalent gram self-join"
    ),
)
def z22(spark, sf_dir):
    from ..operators.train_prep import source_overlap_matrix

    return source_overlap_matrix(load(spark, "documents", sf_dir), n=8)


@query(
    "z23_weighted_sample",
    oracle=f"""
WITH s AS (
  SELECT doc_id, source, n_chars,
         round(n_chars::DOUBLE
               / (({xhash.MD5_HASH32_SQL.format(x="'0' || text")} + 1)
                  / 4294967296.0), 4) AS priority
  FROM documents)
SELECT doc_id, source, n_chars, priority
FROM s ORDER BY priority DESC, doc_id LIMIT 50
""",
    description=(
        "weighted without-replacement corpus sample via priority sampling "
        "(w/u over a content-hash uniform; top-k priorities): the "
        "corpus-mixing draw, deterministic across engines because the "
        "single IEEE division is correctly rounded everywhere (unlike "
        "pow/ln exponential keys). Executes as TakeOrderedAndProject -- "
        "k-row heap per task, no global sort"
    ),
)
def z23(spark, sf_dir):
    from ..operators.train_prep import weighted_priority_sample

    d = load(spark, "documents", sf_dir).select("doc_id", "source", "n_chars", "text")
    return weighted_priority_sample(d, k=50, weight_col="n_chars").drop("text")


@query(
    "z28_source_mixing",
    oracle=f"""
WITH per_source AS (
  SELECT source, count(*) AS n_docs,
         sum(CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len({_TOKENS_SQL}) END)::BIGINT AS n_tokens
  FROM documents GROUP BY source),
capped AS (
  SELECT *, least(n_tokens, 100000) AS capped_tokens FROM per_source)
SELECT source, n_docs, n_tokens, capped_tokens,
       (capped_tokens * 1000000 // (SELECT sum(capped_tokens) FROM capped))::BIGINT
         AS weight_ppm
FROM capped
""",
    description=(
        "corpus-mixing weight table: per-source doc/token counts with "
        "capped token mass normalized to exact integer ppm weights (the "
        "guard against one crawl dominating the mixture). Pure integer "
        "arithmetic -- deterministic across engines/partition orders; one "
        "map-side-combined source groupBy + a 1-row total broadcast"
    ),
)
def z28(spark, sf_dir):
    from ..operators.train_prep import source_mixing_weights

    return source_mixing_weights(load(spark, "documents", sf_dir))


@query(
    "z29_argmax_family",
    oracle=f"""
WITH t AS (
  SELECT source, doc_id,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len({_TOKENS_SQL}) END AS n_tokens
  FROM documents),
k AS (
  SELECT source,
         max(n_tokens * 10000000 + doc_id) AS kmax,
         min(n_tokens * 10000000 + doc_id) AS kmin
  FROM t GROUP BY source)
SELECT source,
       (kmax // 10000000)::BIGINT AS longest_tokens,
       (kmax % 10000000)::BIGINT  AS longest_doc_id,
       (kmin // 10000000)::BIGINT AS shortest_tokens,
       (kmin % 10000000)::BIGINT  AS shortest_doc_id
FROM k
""",
    description=(
        "deterministic arg-max/arg-min per group via composite integer "
        "keys (value * 10^7 + id packed into one BIGINT): longest and "
        "shortest doc per source with ties broken by id -- the arg-max "
        "family without max_by's arbitrary tie behavior, and a plain "
        "map-side-combined min/max agg instead of any window"
    ),
)
def z29(spark, sf_dir):
    d = load(spark, "documents", sf_dir)
    n = text.token_count(F.col("text"))
    key = n.cast("long") * 10000000 + F.col("doc_id")
    k = d.select(F.col("source"), key.alias("_k")).groupBy("source").agg(
        F.max("_k").alias("kmax"), F.min("_k").alias("kmin")
    )
    return k.select(
        "source",
        F.expr("kmax div 10000000").alias("longest_tokens"),
        (F.col("kmax") % 10000000).alias("longest_doc_id"),
        F.expr("kmin div 10000000").alias("shortest_tokens"),
        (F.col("kmin") % 10000000).alias("shortest_doc_id"),
    )


@query(
    "z30_grouped_weighted_sample",
    oracle=f"""
WITH s AS (
  SELECT doc_id, source, n_chars,
         round(n_chars::DOUBLE
               / (({xhash.MD5_HASH32_SQL.format(x="'0' || text")} + 1)
                  / 4294967296.0), 4) AS priority
  FROM documents),
r AS (
  SELECT *, row_number() OVER (PARTITION BY source
                               ORDER BY priority DESC, doc_id) AS rn
  FROM s)
SELECT doc_id, source, n_chars, priority FROM r WHERE rn <= 5
""",
    description=(
        "per-source weighted quota sample (priority sampling within each "
        "group): every source contributes its own top-5 weighted draws, "
        "so no source's weight mass crowds out another's quota -- the "
        "per-domain corpus-mixing form. One window shuffle on the group "
        "key; the same engine-portable w/u keys as z23"
    ),
)
def z30(spark, sf_dir):
    from ..operators.train_prep import grouped_priority_sample

    d = load(spark, "documents", sf_dir).select("doc_id", "source", "n_chars", "text")
    return grouped_priority_sample(
        d, n_per_group=5, weight_col="n_chars"
    ).drop("text")


@query(
    "z35_keyword_search",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKENS_SQL}) AS w FROM documents),
hits AS (
  SELECT doc_id, w FROM tok WHERE w IN ('merge', 'window')),
g AS (
  SELECT doc_id, count(DISTINCT w) AS nterms, count(*) AS total_tf
  FROM hits GROUP BY doc_id)
SELECT doc_id, total_tf FROM g WHERE nterms = 2
ORDER BY total_tf DESC, doc_id LIMIT 20
""",
    description=(
        "conjunctive keyword retrieval ('merge' AND 'window') ranked by "
        "exact integer total term frequency (no idf log -- libm last-ulp "
        "differences would break cross-engine ranking), id tie-break. "
        "Query terms are filtered inside the scan projection before the "
        "explode, so non-matching tokens never leave the row; one "
        "doc-keyed aggregate + TakeOrdered top-k"
    ),
)
def z35(spark, sf_dir):
    return text.keyword_search(
        load(spark, "documents", sf_dir), terms=["merge", "window"]
    )

@query(
    "z36_bm25_rank",
    oracle=_bm25_sql(["merge", "window", "partition"], _TOKENS_SQL),
    description=(
        "BM25-style disjunctive ranked retrieval, deterministic "
        "cross-engine: Robertson odds idf WITHOUT the log (libm "
        "transcendentals differ in the last ulp across engines; every "
        "remaining op is IEEE-correctly-rounded so the identical "
        "expression tree hashes bit-for-bit). Per-term tf computed "
        "row-locally in the scan projection (no explode), corpus stats "
        "one broadcast scalar row, TakeOrdered top-k. At rest the same "
        "ranking runs bucket-pruned off write_posting_index (equivalence "
        "pinned in tests/test_operators_misc.py)"
    ),
)
def z36(spark, sf_dir):
    return text.bm25_rank(
        load(spark, "documents", sf_dir),
        terms=["merge", "window", "partition"],
    )


@query(
    "z39_kmv_distinct",
    oracle=_sketch.kmv_oracle_sql("text", k=256, group_by="source"),
    description=(
        "deterministic KMV distinct sketch (Bar-Yossef et al.): per-source "
        "approximate distinct documents from the 256 smallest md5-derived "
        "48-bit hashes -- an APPROXIMATE answer that is still a pure "
        "function of the data, so the oracle hash gate applies to it "
        "(unlike approx_count_distinct, q51). Sketch is k x 8 bytes per "
        "group and MERGEABLE (k-min of unioned k-min sets == k-min of the "
        "union; pinned in tests), the property that lets 100 TB partial "
        "scans compose without a rescan"
    ),
)
def z39(spark, sf_dir):
    return _sketch.kmv_distinct(
        load(spark, "documents", sf_dir), "text", k=256, group_by="source"
    )


@query(
    "z44_winsorize",
    oracle="""
WITH p AS (
  SELECT o_orderstatus,
         quantile_cont(o_totalprice, 0.05) AS plo,
         quantile_cont(o_totalprice, 0.95) AS phi
  FROM orders GROUP BY o_orderstatus)
SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice,
       least(greatest(o.o_totalprice, p.plo), p.phi) AS o_totalprice_winsorized
FROM orders o JOIN p USING (o_orderstatus)
""",
    description=(
        "per-group winsorization: clamp to the exact [p5, p95] "
        "percentiles -- the standard outlier-clipping pass before "
        "normalizing features/quality scores for training. One "
        "group-bounded percentile aggregate broadcast back + a row-local "
        "least/greatest clamp; clamped rows carry exact input doubles"
    ),
)
def z44(spark, sf_dir):
    from ..operators.train_prep import winsorize

    return winsorize(
        load(spark, "orders", sf_dir).select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        ),
        "o_totalprice",
        lo=0.05,
        hi=0.95,
        group_by="o_orderstatus",
    )


@query(
    "z48_doc_keywords",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKENS_SQL}) AS term FROM documents),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
n AS (SELECT count(*) AS n_docs FROM documents),
dfreq AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1
  HAVING count(DISTINCT doc_id) >= 2),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         round(tf.tf * ((n.n_docs - d.df + 0.5) / (d.df + 0.5)), 6) AS score
  FROM tf JOIN dfreq d USING (term) CROSS JOIN n),
r AS (
  SELECT *, (row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, term))::INT AS rank
  FROM scored)
SELECT doc_id, rank, term, tf, score FROM r WHERE rank <= 3
""",
    description=(
        "document keyword extraction: top-3 distinctive terms per doc by "
        "tf x odds-idf (log-free Robertson odds, bit-stable ranking; "
        "stopwords self-suppress via df ~ N, min_df=2 prunes hapax "
        "noise). Explode -> tf aggregate, vocabulary-bounded df join, "
        "row-local score, per-doc rank -- all shuffles linear in tokens "
        "or vocabulary"
    ),
)
def z48(spark, sf_dir):
    return text.top_terms_per_doc(load(spark, "documents", sf_dir))


@query(
    "z50_corpus_pipeline_v2",
    oracle=f"""
WITH keep AS (
  SELECT min(doc_id) AS doc_id
  FROM (SELECT doc_id,
               md5(trim(regexp_replace(regexp_replace(
                     translate(lower(text), '{text.ACCENT_SRC}', '{text.ACCENT_DST}'),
                     '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))) AS h
        FROM documents)
  GROUP BY h),
d AS (
  SELECT doc_id, source, text FROM documents JOIN keep USING (doc_id)),
q AS (
  SELECT doc_id, source, text,
         (CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE len({_TOKENS_SQL}) END)::INT AS n_tokens,
         {text.QUALITY_MICROS_SQL.format(t="text")} / 1000000.0
           AS quality_score
  FROM d),
p AS (
  SELECT source, quantile_cont(quality_score, 0.05) AS plo,
         quantile_cont(quality_score, 0.95) AS phi
  FROM q GROUP BY source),
wq AS (
  SELECT q.*, least(greatest(q.quality_score, p.plo), p.phi) AS q_wins
  FROM q JOIN p USING (source)),
s AS (
  SELECT *, CASE WHEN {_POLY_SQL.format(x="md5(text)")} % 100 < 80 THEN 'train'
                 WHEN {_POLY_SQL.format(x="md5(text)")} % 100 < 90 THEN 'valid'
                 ELSE 'test' END AS split
  FROM wq),
stats AS (
  SELECT split, source, count(*) AS n_docs, sum(n_tokens) AS total_tokens,
         min(q_wins) AS q_min, max(q_wins) AS q_max
  FROM s GROUP BY 1, 2),
hv AS (
  SELECT DISTINCT split || '/' || source AS grp,
         ('0x' || substr(md5(text), 1, 12))::BIGINT AS hv
  FROM s),
r AS (SELECT grp, hv, row_number() OVER (PARTITION BY grp ORDER BY hv) AS rn
      FROM hv),
km AS (SELECT grp, count(*) AS n_kept, max(hv) AS hk
       FROM r WHERE rn <= 256 GROUP BY grp),
est AS (
  SELECT grp, CASE WHEN n_kept < 256 THEN n_kept
              ELSE CAST(round(255.0 * 281474976710656.0 / hk) AS BIGINT)
         END AS est_distinct_texts
  FROM km)
SELECT st.split, st.source, st.n_docs, st.total_tokens, st.q_min, st.q_max,
       e.est_distinct_texts
FROM stats st JOIN est e ON e.grp = st.split || '/' || st.source
""",
    description=(
        "corpus build v2, chaining the round-4 operators end-to-end: "
        "canonical-form dedup survivor -> quality scoring -> per-source "
        "winsorized quality (exact [p5, p95] clamp) -> leak-safe content "
        "hash split -> per-(split, source) stats including min/max "
        "winsorized quality (verbatim doubles, no re-rounding -- the q49 "
        "lesson) and a mergeable KMV distinct-text estimate. Every stage "
        "is the verified operator itself"
    ),
)
def z50(spark, sf_dir):
    from ..operators.sketch import kmv_distinct
    from ..operators.train_prep import hash_split, winsorize

    docs = load(spark, "documents", sf_dir)
    keep = text.canonical_dedup_groups(docs).select(
        F.col("keep_id").alias("doc_id")
    )
    deduped = docs.join(keep, "doc_id", "left_semi").select(
        "doc_id", "source", "text"
    )
    enriched = text.with_quality(deduped, keep_cols=["source", "text"])
    wins = winsorize(
        enriched, "quality_score", lo=0.05, hi=0.95, group_by="source",
        out_col="q_wins",
    )
    s = hash_split(wins)
    stats = s.groupBy("split", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("q_wins").alias("q_min"),
        F.max("q_wins").alias("q_max"),
    )
    grp = s.withColumn("grp", F.concat_ws("/", "split", "source"))
    est = kmv_distinct(grp, "text", k=256, group_by="grp").select(
        F.col("grp"), F.col("est_distinct").alias("est_distinct_texts")
    )
    return stats.join(
        est,
        F.concat_ws("/", "split", "source") == F.col("grp"),
    ).drop("grp")


@query(
    "z52_vocab_drift",
    oracle=f"""
WITH tok AS (
  SELECT source AS s, unnest({_TOKENS_SQL}) AS term
  FROM documents WHERE source IN ('src0', 'src1')),
c AS (
  SELECT term,
         sum((s = 'src0')::BIGINT) AS n_a,
         sum((s = 'src1')::BIGINT) AS n_b
  FROM tok GROUP BY term HAVING sum((s = 'src0')::BIGINT)
                              + sum((s = 'src1')::BIGINT) >= 5),
t AS (SELECT sum(n_a) AS ta, sum(n_b) AS tb FROM c),
x AS (
  SELECT term, n_a, n_b,
         (n_a + n_b) * ta / (ta + tb) AS ea,
         (n_a + n_b) * tb / (ta + tb) AS eb
  FROM c CROSS JOIN t)
SELECT term, n_a, n_b,
       round((n_a - ea) * (n_a - ea) / ea
             + (n_b - eb) * (n_b - eb) / eb, 6) AS chi2
FROM x ORDER BY chi2 DESC, term LIMIT 20
""",
    description=(
        "vocabulary drift between two corpus slices: per-term chi-square "
        "contributions vs the homogeneity expectation, top-20 drivers -- "
        "the distribution-shift monitor between crawls/sources. "
        "Chi-square, not KL: division-only (KL's log is libm, breaking "
        "cross-engine bit parity). One explode -> conditional-sum pivot, "
        "1-row totals broadcast, row-local arithmetic, TakeOrdered"
    ),
)
def z52(spark, sf_dir):
    return text.vocabulary_drift(
        load(spark, "documents", sf_dir), "src0", "src1"
    )


@query(
    "z59_ks_drift",
    oracle=f"""
WITH pair AS (
  SELECT source, text FROM documents WHERE source IN ('src0', 'src1')),
q AS (
  SELECT source,
         {text.QUALITY_MICROS_SQL.format(t="text")} / 1000000.0
           AS quality_score
  FROM pair),
c AS (
  SELECT quality_score,
         sum((source = 'src0')::BIGINT) AS ca,
         sum((source = 'src1')::BIGINT) AS cb
  FROM q GROUP BY quality_score),
tot AS (SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb FROM c),
cdf AS (
  SELECT sum(ca) OVER (ORDER BY quality_score
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_a,
         sum(cb) OVER (ORDER BY quality_score
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_b
  FROM c)
SELECT na AS n_a, nb AS n_b,
       {_ratio_sql("max(abs(cum_a * nb - cum_b * na))", "na * nb")} AS ks_d
FROM cdf CROSS JOIN tot GROUP BY na, nb
""",
    description=(
        "two-sample Kolmogorov-Smirnov distance between two sources' "
        "quality-score distributions: the numeric-drift monitor "
        "complementing z52's vocabulary chi-square. Counts + single "
        "divisions only; the ordered cumulative window runs over "
        "|distinct 6-dp score values|, never corpus rows"
    ),
)
def z59(spark, sf_dir):
    return text.score_distribution_drift(
        load(spark, "documents", sf_dir), "src0", "src1"
    )


@query(
    "z66_phrase_search",
    oracle=f"""
WITH d AS (SELECT doc_id, {_TOKENS_SQL} AS w FROM documents),
p AS (
  SELECT doc_id,
         len(list_intersect(
           [p + 1 for p in
             [i for i in generate_series(1, len(w)) if w[i] = 'window']],
           [i for i in generate_series(1, len(w)) if w[i] = 'join']))
           AS n_matches
  FROM d)
SELECT doc_id, n_matches FROM p WHERE n_matches > 0
ORDER BY n_matches DESC, doc_id LIMIT 20
""",
    description=(
        "exact phrase retrieval ('window join' contiguously): per-term "
        "position lists are row-local index-filter transforms inside the "
        "scan projection, phrase matching is a positions(t_i)+1 ∩ "
        "positions(t_{{i+1}}) fold whose survivors ARE the match "
        "positions -- the positional upgrade AND-of-terms retrieval "
        "cannot express. No explode, no shuffle before the top-k"
    ),
)
def z66(spark, sf_dir):
    return text.phrase_search(
        load(spark, "documents", sf_dir), phrase=["window", "join"]
    )


@query(
    "z78_catalog_summary",
    oracle="""
SELECT 'customer' AS table_name, count(*) AS n_rows,
       count(DISTINCT c_custkey) AS n_distinct_pk FROM customer
UNION ALL SELECT 'events', count(*), count(DISTINCT event_id) FROM events
UNION ALL SELECT 'lineitem', count(*),
                 count(DISTINCT (l_orderkey, l_linenumber)) FROM lineitem
UNION ALL SELECT 'nation', count(*), count(DISTINCT n_nationkey) FROM nation
UNION ALL SELECT 'orders', count(*), count(DISTINCT o_orderkey) FROM orders
UNION ALL SELECT 'region', count(*), count(DISTINCT r_regionkey) FROM region
UNION ALL SELECT 'supplier', count(*), count(DISTINCT s_suppkey) FROM supplier
UNION ALL SELECT 'documents', count(*), count(DISTINCT doc_id) FROM documents
UNION ALL SELECT 'embeddings', count(*), count(DISTINCT vec_id) FROM embeddings
UNION ALL SELECT 'part', count(*), count(DISTINCT p_partkey) FROM part
""",
    description=(
        "catalog health sweep: per-table row count and distinct-PK count "
        "in one union of per-table aggregates -- the first query a "
        "migration/verification run fires (row parity + key integrity "
        "across the whole catalog at a glance; the lineitem composite PK "
        "is genuinely non-unique in the synthetic data and the sweep "
        "shows it)"
    ),
)
def z78(spark, sf_dir):
    pks = {
        "customer": ["c_custkey"],
        "events": ["event_id"],
        "lineitem": ["l_orderkey", "l_linenumber"],
        "nation": ["n_nationkey"],
        "orders": ["o_orderkey"],
        "region": ["r_regionkey"],
        "supplier": ["s_suppkey"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
        "part": ["p_partkey"],
    }
    parts = []
    for t, keys in sorted(pks.items()):
        df = load(spark, t, sf_dir)
        parts.append(
            df.agg(
                F.count("*").alias("n_rows"),
                F.countDistinct(*keys).alias("n_distinct_pk"),
            ).select(F.lit(t).alias("table_name"), "n_rows", "n_distinct_pk")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query(
    "z80_token_budget",
    oracle=f"""
WITH t AS (
  SELECT source,
         sum(CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len({_TOKENS_SQL}) END)::BIGINT AS n_tokens,
         count(*) AS n_docs
  FROM documents GROUP BY source),
g AS (SELECT sum(n_tokens) AS total FROM t)
SELECT source, n_docs, n_tokens,
       round(n_tokens / g.total::DOUBLE, 6) AS token_share
FROM t CROSS JOIN g
""",
    description=(
        "per-source token budget table: docs, exact whitespace tokens, "
        "and share of the corpus total -- the planning table a training "
        "mix is negotiated over (the input z28's capped mixing weights "
        "consume). One group aggregate + a 1-row total broadcast"
    ),
)
def z80(spark, sf_dir):
    t = (
        load(spark, "documents", sf_dir)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(text.token_count(F.col("text")).cast("long")).alias(
                "n_tokens"
            ),
        )
    )
    g = t.agg(F.sum("n_tokens").alias("_total"))
    return t.crossJoin(F.broadcast(g)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(
            F.col("n_tokens") / F.col("_total").cast("double"), 6
        ).alias("token_share"),
    )


from ..operators.train_prep import chunk_documents_oracle_sql as _chunk_sql  # noqa: E402


@query(
    "z108_chunk_documents",
    oracle=_chunk_sql(chunk_tokens=32, overlap=8),
    description=(
        "RAG/embedding-ingest chunking: overlapping 32-token windows "
        "(stride 24) with exact provenance (begin_tok + n_tokens locate "
        "every chunk in its source) -- sequence -> posexplode -> slice, "
        "all inside the scan stage with ZERO shuffle: chunking stays "
        "embarrassingly parallel at 100 TB. Short docs single-chunk, "
        "long docs carry a short final window; the oracle replicates "
        "window arithmetic with generate_series + clamped list slicing"
    ),
)
def z108(spark, sf_dir):
    from ..operators.train_prep import chunk_documents

    return chunk_documents(
        load(spark, "documents", sf_dir), chunk_tokens=32, overlap=8
    )


@query(
    "z82_cluster_safe_split",
    oracle=f"""
WITH RECURSIVE d AS (
  SELECT doc_id, {_SHINGLES_SQL} AS sh
  FROM (SELECT doc_id, {_TOKENS_SQL} AS w FROM documents)),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM d a JOIN d b ON a.doc_id < b.doc_id
  WHERE {_jacc_pred_sql("a.sh", "b.sh", 0.8)}),
sym AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs),
reach(node, lbl) AS (
  SELECT src, src FROM sym
  UNION
  SELECT r.node, s.dst FROM reach r JOIN sym s ON r.lbl = s.src),
cc AS (SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node),
labeled AS (
  SELECT doc.doc_id, coalesce(cc.cluster_id, doc.doc_id) AS cluster_id
  FROM documents doc LEFT JOIN cc ON cc.doc_id = doc.doc_id),
s AS (
  SELECT doc_id, cluster_id,
         CASE WHEN {_POLY_SQL.format(x="md5(cluster_id::VARCHAR)")} % 100 < 80
                THEN 'train'
              WHEN {_POLY_SQL.format(x="md5(cluster_id::VARCHAR)")} % 100 < 90
                THEN 'valid'
              ELSE 'test' END AS split
  FROM labeled)
SELECT split, count(*) AS n_docs,
       count(DISTINCT cluster_id) AS n_clusters
FROM s GROUP BY split
""",
    description=(
        "leak-proof split: documents split by NEAR-DUP CLUSTER id "
        "(pairs -> connected components -> cluster hash bucket), so "
        "variant copies land in the same split by construction -- the "
        "fix for the z81 leakage channel, with leakage = 0 pinned by "
        "test. Output: per-split doc and cluster counts"
    ),
)
def z82(spark, sf_dir):
    from ..operators.train_prep import cluster_safe_split

    s = cluster_safe_split(load(spark, "documents", sf_dir))
    return s.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("cluster_id").alias("n_clusters"),
    )


@query(
    "z84_oov_rate",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKENS_SQL}) AS term FROM documents),
freq AS (
  SELECT term, count(*) AS cnt FROM tok GROUP BY term),
vocab AS (
  SELECT term FROM freq
  ORDER BY cnt DESC, term ASC LIMIT 100),
scored AS (
  SELECT t.doc_id,
         count(*) AS n_tok,
         sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS n_oov
  FROM tok t LEFT JOIN vocab v USING (term)
  GROUP BY t.doc_id)
SELECT doc_id, n_tok::BIGINT AS n_tok, n_oov::BIGINT AS n_oov,
       {_ratio_sql("n_oov", "n_tok")} AS oov_rate
FROM scored
""",
    description=(
        "out-of-vocabulary-rate quality filter: corpus top-100 token "
        "vocabulary (count desc, term asc tiebreak) -> per-doc fraction "
        "of token occurrences outside it, exact HALF_UP micros. The "
        "fastText-style garbage detector: high OOV = boilerplate/noise/"
        "wrong-language. Scale: vocabulary is one tiny broadcast (100 "
        "terms); the explode is linear and dies into a map-side-combined "
        "per-doc aggregate -- no corpus-wide shuffle beyond the doc "
        "groupBy"
    ),
)
def z84(spark, sf_dir):
    docs = load(spark, "documents", sf_dir)
    tok = docs.select(
        "doc_id", F.explode(xhash.ws_tokens(F.col("text"))).alias("term")
    )
    vocab = (
        tok.groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("term"))
        .limit(100)
        .select("term", F.lit(1).alias("_in_vocab"))
    )
    return (
        tok.join(F.broadcast(vocab), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tok"),
            F.sum(
                F.when(F.col("_in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tok",
            "n_oov",
            (
                exactnum.ratio_micros_halfup(F.col("n_oov"), F.col("n_tok"))
                / F.lit(1_000_000.0)
            ).alias("oov_rate"),
        )
    )


@query(
    "z85_tfidf_terms",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKENS_SQL}) AS term FROM documents),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
dl AS (SELECT doc_id, sum(tf) AS doc_len FROM tf GROUP BY doc_id),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
s AS (
  SELECT tf.doc_id, tf.term,
         ((2 * 1000000 * (tf.tf * n.n_docs)
           + (df.df * dl.doc_len))
          // (2 * (df.df * dl.doc_len)))::BIGINT AS score_micros
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN n),
r AS (
  SELECT doc_id, term, score_micros,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score_micros DESC, term ASC) AS rn
  FROM s)
SELECT doc_id, rn::INT AS rn, term, score_micros
FROM r WHERE rn <= 3
""",
    description=(
        "log-free TF-IDF keyword extraction: score = tf/doc_len * N/df "
        "as ONE exact HALF_UP-micros rational (no log, no float -- "
        "ranking by tf*N/(df*len) preserves the tf-idf order for the "
        "top-k cut and stays engine-exact), top-3 terms per doc with "
        "deterministic (score desc, term asc) tiebreak. Scale: df is a "
        "term-keyed aggregate (map-side combined), the per-doc window "
        "partitions on doc_id over |doc x distinct-term| rows -- both "
        "linear in the posting count"
    ),
)
def z85(spark, sf_dir):
    docs = load(spark, "documents", sf_dir)
    tok = docs.select(
        "doc_id", F.explode(xhash.ws_tokens(F.col("text"))).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("doc_len"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.select(
        F.countDistinct("doc_id").alias("n_docs")
    )
    s = (
        tf.join(dfreq, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            exactnum.ratio_micros_halfup(
                F.col("tf") * F.col("n_docs"),
                F.col("df") * F.col("doc_len"),
            ).alias("score_micros"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(
        F.desc("score_micros"), F.asc("term")
    )
    return (
        s.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "rn", "term", "score_micros")
    )


@query(
    "z88_bigram_lm_score",
    oracle=f"""
WITH tok AS (SELECT doc_id, {_TOKENS_SQL} AS w FROM documents),
bg AS (
  SELECT doc_id, w[i] AS h, w[i] || ' ' || w[i+1] AS b
  FROM tok, UNNEST(generate_series(1, len(w) - 1)) AS g(i)),
cb AS (SELECT b, count(*) AS c_bg FROM bg GROUP BY b),
ch AS (SELECT h, count(*) AS c_head FROM bg GROUP BY h),
p AS (
  SELECT bg.doc_id,
         ((2 * 1000000 * cb.c_bg + ch.c_head)
          // (2 * ch.c_head))::BIGINT AS p_micros
  FROM bg JOIN cb USING (b) JOIN ch USING (h))
SELECT doc_id,
       count(*)::BIGINT AS n_bigrams,
       ((2 * sum(p_micros) + count(*)) // (2 * count(*)))::BIGINT
         AS lm_score_micros
FROM p GROUP BY doc_id
""",
    description=(
        "corpus-bigram language-model fluency score (the KenLM-filter "
        "shape without logs): P(w2|w1) = c(w1 w2)/c(w1-as-head) as exact "
        "HALF_UP micros per adjacent pair, doc score = integer mean. "
        "Low score = token sequences the corpus itself finds improbable "
        "(mojibake, shuffled text, wrong language) -- the perplexity "
        "proxy a quality gate thresholds on, engine-exact end to end. "
        "Scale: two count aggregates (map-side combined) + two linear "
        "equi-joins on the position list; no corpus-quadratic anything"
    ),
)
def z88(spark, sf_dir):
    docs = load(spark, "documents", sf_dir)
    # materialize the token array in a projection FIRST: element_at over
    # the raw ws_tokens() expression re-evaluates the split per element
    # (measured 19 s -> 4.6 s at sf0.1, flat to 16x). arrays_zip of two
    # slices builds all adjacent pairs in one codegen'd pass.
    t = docs.withColumn("toks", xhash.ws_tokens(F.col("text")))
    sz = F.size("toks")
    pairs = F.when(
        sz >= 2,
        F.arrays_zip(
            F.slice("toks", 1, sz - 1).alias("h"),
            F.slice(F.col("toks"), 2, sz - 1).alias("t2"),
        ),
    ).otherwise(F.array())
    bg = t.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id",
        F.col("p.h").alias("h"),
        F.concat_ws(" ", F.col("p.h"), F.col("p.t2")).alias("b"),
    )
    cb = bg.groupBy("b").agg(F.count("*").alias("c_bg"))
    ch = bg.groupBy("h").agg(F.count("*").alias("c_head"))
    p = (
        bg.join(cb, "b")
        .join(ch, "h")
        .select(
            "doc_id",
            exactnum.ratio_micros_halfup(
                F.col("c_bg"), F.col("c_head")
            ).alias("p_micros"),
        )
    )
    num, den = F.sum("p_micros"), F.count("*")
    return p.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        exactnum.floordiv_nonneg(
            F.lit(2) * num + den, F.lit(2) * den
        ).alias("lm_score_micros"),
    )


@query(
    "z90_scalable_cumsum",
    oracle=f"""
WITH t AS (
  SELECT doc_id,
         (CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE len({_TOKENS_SQL}) END)::BIGINT AS n_tokens
  FROM documents)
SELECT doc_id, n_tokens,
       (sum(n_tokens) OVER (ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING))::BIGINT AS cum
FROM t
""",
    description=(
        "scalable prefix sum: running corpus token total in doc_id order "
        "WITHOUT the global ordered window (the plans.lint anti-pattern "
        "-- all rows on one partition). Two-level scan: fixed-range "
        "buckets of the order key -> per-bucket totals -> exclusive "
        "offsets over the BUCKET axis (n/width rows, recursively "
        "bucketable) -> broadcast offsets + within-bucket windows, "
        "parallel across buckets. Exact integers; the oracle IS the "
        "naive global-window definition"
    ),
)
def z90(spark, sf_dir):
    from ..operators.prefix import bucketed_cumsum

    docs = load(spark, "documents", sf_dir).select(
        "doc_id", text.token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    return bucketed_cumsum(docs, "doc_id", "n_tokens", bucket_width=64)


@query(
    "z91_token_shards",
    oracle=f"""
WITH t AS (
  SELECT doc_id,
         (CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE len({_TOKENS_SQL}) END)::BIGINT AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
           - n_tokens AS excl
  FROM t)
SELECT (excl // 20000)::BIGINT AS shard_id,
       count(*)::BIGINT AS n_docs,
       sum(n_tokens)::BIGINT AS n_tokens,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM c GROUP BY 1
""",
    description=(
        "token-budget shard manifest: documents in doc_id order cut into "
        "~20k-token shards (a doc never splits; shard = floor(exclusive "
        "running total / budget)), one exact-integer manifest row per "
        "shard -- the pre-tokenization sharding step of a training-data "
        "build, on the scalable-cumsum primitive instead of a global "
        "window"
    ),
)
def z91(spark, sf_dir):
    from ..operators.prefix import token_shards

    docs = load(spark, "documents", sf_dir).select(
        "doc_id", text.token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    return token_shards(docs, budget_tokens=20000, bucket_width=64)


@query(
    "z92_largest_remainder_mix",
    oracle=f"""
WITH t AS (
  SELECT source,
         sum(CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len({_TOKENS_SQL}) END)::BIGINT AS tokens
  FROM documents GROUP BY source),
tot AS (SELECT sum(tokens)::BIGINT AS T FROM t),
q AS (
  SELECT source, tokens,
         (100000 * tokens) // T AS base,
         (100000 * tokens) % T AS rem
  FROM t CROSS JOIN tot),
lo AS (SELECT 100000 - sum(base) AS leftover FROM q),
r AS (
  SELECT source, tokens, base, rem,
         row_number() OVER (ORDER BY rem DESC, source ASC) AS rk
  FROM q)
SELECT source, tokens,
       (base + CASE WHEN rk <= (SELECT leftover FROM lo)
                    THEN 1 ELSE 0 END)::BIGINT AS quota
FROM r
""",
    description=(
        "corpus-mixing quota allocation by the largest-remainder "
        "(Hamilton) method: a 100k-token budget split proportionally to "
        "per-source token mass in EXACT integer arithmetic -- base = "
        "B*t//T, leftovers to the largest remainders (rem desc, source "
        "asc tiebreak), so quotas sum to the budget exactly (float "
        "proportions never do). Per-source aggregate + a window over "
        "|sources| rows; engine-exact by construction"
    ),
)
def z92(spark, sf_dir):
    B = 100000
    docs = load(spark, "documents", sf_dir)
    t = docs.groupBy("source").agg(
        F.sum(text.token_count(F.col("text")).cast("long")).alias("tokens")
    )
    tot = t.agg(F.sum("tokens").alias("T"))
    q = t.crossJoin(F.broadcast(tot)).select(
        "source",
        "tokens",
        exactnum.floordiv_nonneg(F.lit(B) * F.col("tokens"), F.col("T")).alias(
            "base"
        ),
        ((F.lit(B) * F.col("tokens")) % F.col("T")).alias("rem"),
    )
    lo = q.agg((F.lit(B) - F.sum("base")).alias("leftover"))
    w = W.orderBy(F.desc("rem"), F.asc("source"))
    return (
        q.withColumn("rk", F.row_number().over(w))
        .crossJoin(F.broadcast(lo))
        .select(
            "source",
            "tokens",
            (
                F.col("base")
                + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
            ).alias("quota"),
        )
    )


@query(
    "z93_quota_sample",
    oracle=f"""
WITH d AS (
  SELECT source, doc_id,
         (CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE len({_TOKENS_SQL}) END)::BIGINT AS n_tokens,
         md5(text) AS h
  FROM documents),
c AS (
  SELECT source, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM d)
SELECT source,
       count(*) FILTER (WHERE cum <= 20000)::BIGINT AS n_docs_selected,
       coalesce(sum(n_tokens) FILTER (WHERE cum <= 20000), 0)::BIGINT
         AS tokens_selected
FROM c GROUP BY source
""",
    description=(
        "per-source quota-bounded selection: docs ordered by content "
        "hash (deterministic, unbiased by id order) and taken while the "
        "per-source running token total stays within a 20k quota -- the "
        "down-sampling step that follows z92's allocation. The cumsum "
        "window partitions by source (parallel across sources; within a "
        "source the bucketed-cumsum primitive applies at 100 TB). Exact "
        "integers end to end"
    ),
)
def z93(spark, sf_dir):
    docs = load(spark, "documents", sf_dir).select(
        "source",
        "doc_id",
        text.token_count(F.col("text")).cast("long").alias("n_tokens"),
        F.md5("text").alias("h"),
    )
    w = (
        W.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    c = docs.withColumn("cum", F.sum("n_tokens").over(w))
    sel = F.col("cum") <= 20000
    return c.groupBy("source").agg(
        F.sum(sel.cast("long")).alias("n_docs_selected"),
        F.coalesce(
            F.sum(F.when(sel, F.col("n_tokens"))), F.lit(0)
        ).alias("tokens_selected"),
    )


@query(
    "z94_length_batching",
    oracle=f"""
WITH t AS (
  SELECT doc_id,
         (CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE len({_TOKENS_SQL}) END)::BIGINT AS n
  FROM documents),
len_b AS (
  SELECT doc_id, n, n // 64 AS bkt,
         (row_number() OVER (PARTITION BY n // 64 ORDER BY n, doc_id) - 1)
           // 16 AS batch
  FROM t),
id_b AS (
  SELECT doc_id, n, doc_id // 64 AS bkt,
         (row_number() OVER (PARTITION BY doc_id // 64 ORDER BY doc_id) - 1)
           // 16 AS batch
  FROM t),
lw AS (
  SELECT count(DISTINCT (bkt, batch)) AS n_batches,
         sum(mx - n)::BIGINT AS padding
  FROM (SELECT n, bkt, batch,
               max(n) OVER (PARTITION BY bkt, batch) AS mx FROM len_b)),
iw AS (
  SELECT count(DISTINCT (bkt, batch)) AS n_batches,
         sum(mx - n)::BIGINT AS padding
  FROM (SELECT n, bkt, batch,
               max(n) OVER (PARTITION BY bkt, batch) AS mx FROM id_b))
SELECT 'length_bucketed' AS strategy, n_batches, padding FROM lw
UNION ALL
SELECT 'arrival_order', n_batches, padding FROM iw
""",
    description=(
        "length-bucketed dynamic batching vs arrival-order batching: "
        "docs grouped into 16-doc batches either within 64-token length "
        "buckets (similar lengths together) or by id order, padding "
        "waste = sum(batch_max - len). The padded-token accounting that "
        "motivates length-aware batching in training loaders, in exact "
        "integers; every window partitions by a bucket key (parallel, "
        "no global ordering)"
    ),
)
def z94(spark, sf_dir):
    docs = load(spark, "documents", sf_dir).select(
        "doc_id", text.token_count(F.col("text")).cast("long").alias("n")
    )

    def strategy(bkt_col, order_cols, name):
        w = W.partitionBy("bkt").orderBy(*order_cols)
        batched = docs.withColumn("bkt", bkt_col).withColumn(
            "batch",
            exactnum.floordiv_nonneg(
                F.row_number().over(w) - 1, F.lit(16)
            ),
        )
        mx = F.max("n").over(W.partitionBy("bkt", "batch"))
        per = batched.withColumn("mx", mx)
        return per.agg(
            F.lit(name).alias("strategy"),
            F.countDistinct("bkt", "batch").alias("n_batches"),
            F.sum(F.col("mx") - F.col("n")).alias("padding"),
        )

    by_len = strategy(
        exactnum.floordiv_nonneg(F.col("n"), F.lit(64)),
        [F.col("n"), F.col("doc_id")],
        "length_bucketed",
    )
    by_id = strategy(
        exactnum.floordiv_nonneg(F.col("doc_id"), F.lit(64)),
        [F.col("doc_id")],
        "arrival_order",
    )
    return by_len.unionByName(by_id)


def _cms_hash_sql(i: int, term: str = "term") -> str:
    h32 = xhash.MD5_HASH32_SQL.format(x=f"'{i}|' || {term}")
    return f"({h32} % 1024)"


@query(
    "z95_countmin_tokens",
    oracle=f"""
WITH tok AS (
  SELECT unnest({_TOKENS_SQL}) AS term FROM documents),
exact_c AS (
  SELECT term, count(*)::BIGINT AS true_count FROM tok GROUP BY term),
top20 AS (
  SELECT term, true_count FROM exact_c
  ORDER BY true_count DESC, term ASC LIMIT 20),
cms AS (
  SELECT row_i, bucket, count(*)::BIGINT AS c
  FROM (
    SELECT 0 AS row_i, {_cms_hash_sql(0)} AS bucket FROM tok
    UNION ALL SELECT 1, {_cms_hash_sql(1)} FROM tok
    UNION ALL SELECT 2, {_cms_hash_sql(2)} FROM tok
    UNION ALL SELECT 3, {_cms_hash_sql(3)} FROM tok)
  GROUP BY row_i, bucket),
est AS (
  SELECT t.term, t.true_count, min(c.c)::BIGINT AS cms_estimate
  FROM top20 t
  JOIN cms c ON (
       (c.row_i = 0 AND c.bucket = {_cms_hash_sql(0, "t.term")})
    OR (c.row_i = 1 AND c.bucket = {_cms_hash_sql(1, "t.term")})
    OR (c.row_i = 2 AND c.bucket = {_cms_hash_sql(2, "t.term")})
    OR (c.row_i = 3 AND c.bucket = {_cms_hash_sql(3, "t.term")}))
  GROUP BY t.term, t.true_count)
SELECT term, true_count, cms_estimate,
       (cms_estimate >= true_count) AS never_underestimates
FROM est
""",
    description=(
        "Count-Min sketch heavy hitters, in-gate evaluated: a 4 x 1024 "
        "CMS over corpus tokens (portable md5-derived row hashes, so the "
        "oracle rebuilds the identical sketch), estimates for the exact "
        "top-20 tokens next to their true counts, plus the CMS "
        "soundness invariant (estimate >= truth, always). The sketch "
        "build is ONE map-side-combined aggregate over 4 x 1024 cells "
        "-- mergeable across partitions/batches by cell-wise addition, "
        "the streaming-friendly frequency summary KMV/HLL do not give"
    ),
)
def z95(spark, sf_dir):
    docs = load(spark, "documents", sf_dir)
    tok = docs.select(F.explode(xhash.ws_tokens(F.col("text"))).alias("term"))

    def bucket(i, col=None):
        c = F.col("term") if col is None else col
        return (
            xhash.md5_hash32(F.concat(F.lit(f"{i}|"), c)) % 1024
        ).alias("bucket")

    cells = None
    for i in range(4):
        part = tok.select(F.lit(i).alias("row_i"), bucket(i))
        cells = part if cells is None else cells.unionByName(part)
    cms = cells.groupBy("row_i", "bucket").agg(F.count("*").alias("c"))

    exact_c = tok.groupBy("term").agg(F.count("*").alias("true_count"))
    top20 = exact_c.orderBy(
        F.desc("true_count"), F.asc("term")
    ).limit(20)
    # probe: the 20 candidates explode to (term, row_i, bucket) and join
    # the (tiny, 4x1024-bounded) sketch; min over rows = the CMS estimate
    probes = None
    for i in range(4):
        p = top20.select(
            "term", "true_count", F.lit(i).alias("row_i"), bucket(i)
        )
        probes = p if probes is None else probes.unionByName(p)
    est = (
        probes.join(F.broadcast(cms), ["row_i", "bucket"])
        .groupBy("term", "true_count")
        .agg(F.min("c").alias("cms_estimate"))
    )
    return est.select(
        "term",
        "true_count",
        "cms_estimate",
        (F.col("cms_estimate") >= F.col("true_count")).alias(
            "never_underestimates"
        ),
    )


@query(
    "z96_text_scrub",
    oracle="""
WITH aug AS (
  SELECT doc_id,
         text || chr(7) || '  tail' || chr(31) || chr(9) || 'x' AS t
  FROM documents),
e AS (
  SELECT doc_id, t,
         regexp_replace(t, '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g')
           AS no_ctl
  FROM aug)
SELECT doc_id,
       len(regexp_extract_all(t,
           '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]'))::INT AS n_control,
       len(regexp_extract_all(no_ctl, '\\s{2,}'))::INT AS n_ws_collapsed,
       trim(regexp_replace(no_ctl, '\\s+', ' ', 'g')) AS scrubbed
FROM e
""",
    description=(
        "ingest text hygiene: strip control characters, collapse "
        "whitespace runs, trim -- with exact per-doc audit counters over "
        "a deterministic dirty-fixture suffix (the raw corpus is clean, "
        "so the appended BEL/US/TAB bytes make the scrub non-trivial). "
        "Pure regexp codegen on identical character classes both engines"
    ),
)
def z96(spark, sf_dir):
    docs = load(spark, "documents", sf_dir)
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit("\x07"),
            F.lit("  tail"),
            F.lit("\x1f"),
            F.lit("\t"),
            F.lit("x"),
        ).alias("t"),
    )
    return text.scrub_text(aug, text_col="t").select(
        "doc_id", "n_control", "n_ws_collapsed", "scrubbed"
    )


@query(
    "z103_kmv_source_overlap",
    oracle=_sketch.kmv_source_overlap_oracle_sql("text", k=256),
    description=(
        "pairwise distinct-document overlap between sources from KMV "
        "sketches (Beyer et al. SIGMOD'07 multiset synopses): per pair, "
        "the k-smallest-hash UNION sketch yields est_union, and the "
        "fraction of its members present in BOTH sides yields "
        "est_intersect and an exact-integer Jaccard (micros). All "
        "estimates are PURE INT64 floor arithmetic (no IEEE division, "
        "no round(double)) so the approximate answer is still "
        "bit-portable across engines. One distinct shuffle over "
        "(source, hash48); everything pairwise is sketch-sized "
        "(k rows/source), the shape that lets 100 TB cross-source "
        "audits run off k*8-byte synopses"
    ),
)
def z103(spark, sf_dir):
    return _sketch.kmv_source_overlap(
        load(spark, "documents", sf_dir), "text", source_col="source", k=256
    )


@query(
    "z116_epoch_shuffle",
    oracle="""
WITH keyed AS (
  SELECT doc_id,
         ('0x' || substr(md5('7:' || doc_id::VARCHAR), 1, 12))::BIGINT
             AS shuffle_key
  FROM documents)
SELECT doc_id, shuffle_key,
       (shuffle_key % 8)::INT AS shard,
       row_number() OVER (PARTITION BY shuffle_key % 8
                          ORDER BY shuffle_key, doc_id) AS pos
FROM keyed
""",
    description=(
        "deterministic epoch shuffle for training order: 48-bit "
        "md5(seed:id) key deals every row to a shard and ranks it "
        "inside -- (shard, pos) IS the epoch's read order, "
        "reproducible bit-for-bit from the seed on any cluster "
        "layout. One shuffle keyed on shard + per-shard windows "
        "(corpus/n_shards rows each); NO global sort or "
        "single-partition window, so a 100 TB epoch shuffles once "
        "and writes n_shards independent streams"
    ),
)
def z116(spark, sf_dir):
    from ..operators.train_prep import epoch_shuffle

    return epoch_shuffle(
        load(spark, "documents", sf_dir), seed=7, n_shards=8
    ).select("doc_id", "shuffle_key", "shard", "pos")


@query(
    "z117_stride_interleave",
    oracle="""
WITH r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(text), doc_id) AS src_rank
  FROM documents
  WHERE source IN ('src0', 'src1', 'src2'))
SELECT doc_id, source, src_rank,
       (2 * src_rank - 1) * CASE source WHEN 'src0' THEN 2
                                        WHEN 'src1' THEN 3
                                        ELSE 6 END AS interleave_key
FROM r
""",
    description=(
        "stride-scheduled proportional interleave of sources into one "
        "training stream (weights src0:3 src1:2 src2:1): every prefix "
        "of the interleave_key order tracks the weight mix to within "
        "one round, by exact integer arithmetic (no float pass "
        "positions, bit-portable). One rank window per source + pure "
        "expressions; the global order ships as a SORT KEY consumers "
        "range-partition on, never a materialized global row_number"
    ),
)
def z117(spark, sf_dir):
    from ..operators.train_prep import stride_interleave

    return stride_interleave(
        load(spark, "documents", sf_dir),
        weights={"src0": 3, "src1": 2, "src2": 1},
    ).select("doc_id", "source", "src_rank", "interleave_key")


@query(
    "z119_vocab_encode",
    oracle="""
WITH tok AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE string_split_regex(trim(lower(text)), '\\s+') END AS w
  FROM documents),
counts AS (
  SELECT tokn, count(*) AS n
  FROM (SELECT unnest(w) AS tokn FROM tok)
  GROUP BY 1),
vocab AS (
  SELECT tokn,
         row_number() OVER (ORDER BY n DESC, tokn) AS token_id
  FROM counts ORDER BY n DESC, tokn LIMIT 64),
pos AS (
  SELECT doc_id,
         unnest([{'pos': i, 'tokn': w[i]}
                 FOR i IN generate_series(1, len(w))],
                recursive := true)
  FROM tok),
enc AS (
  SELECT p.doc_id, p.pos, coalesce(v.token_id, 0)::INT AS tid
  FROM pos p LEFT JOIN vocab v USING (tokn)),
agg AS (
  SELECT doc_id, list(tid ORDER BY pos) AS token_ids,
         count(*) AS n, sum((tid = 0)::INT) AS oov
  FROM enc GROUP BY 1)
SELECT t.doc_id,
       coalesce(a.token_ids, []::INT[]) AS token_ids,
       coalesce(a.n, 0)::INT AS n_tokens,
       coalesce(a.oov, 0)::INT AS n_oov
FROM tok t LEFT JOIN agg a USING (doc_id)
""",
    description=(
        "frozen-vocabulary token-id encoding (the corpus -> trainer "
        "handoff): top-64 tokens by (count desc, token asc) get dense "
        "ids 1..64, docs re-emit as int id arrays with OOV=0 and "
        "auditable per-doc OOV counts. Vocab = one map-side-combined "
        "count + TakeOrdered limit (id window runs over the LIMITED "
        "64 rows only); encode = explode -> broadcast left join on the "
        "vocab -> one groupBy(doc) ordered reassembly"
    ),
)
def z119(spark, sf_dir):
    from ..operators.train_prep import build_vocab, encode_tokens

    docs = load(spark, "documents", sf_dir)
    return encode_tokens(docs, build_vocab(docs, top_n=64))


def _bpe_oracle() -> str:
    from ..operators.bpe import SHIPPED_MERGES, bpe_tokenize_oracle_sql

    return bpe_tokenize_oracle_sql(SHIPPED_MERGES)


@query(
    "z123_bpe_tokenize",
    # Upgraded from rows-only in round 11 (VERDICT r10 #1): the gated
    # entry is the SERVING path -- the rank-greedy encoder applied with
    # the baked SHIPPED_MERGES artifact (trained once via bpe_train,
    # the way production ships a tokenizer) -- with a full SQL oracle
    # via the z126/z127 shared-mapping-table pattern (double-space
    # sequential-replace algebra; equivalence argument in
    # bpe_tokenize_oracle_sql's docstring). Iterative merge TRAINING
    # stays pinned merge-for-merge against an independent pure-Python
    # reference in tests/test_operators_misc.py::
    # test_bpe_train_matches_reference_and_segment_roundtrips.
    oracle=_bpe_oracle(),
    description=(
        "BPE tokenizer serving (Sennrich ACL'16): encode the corpus "
        "with a shipped merge list -- the rank-greedy Python loop runs "
        "only over DISTINCT words (Arrow batches) and segmentations "
        "join back to the corpus, so Python cost is vocab-sized, never "
        "corpus-sized; FULL SQL oracle replays the merges as "
        "double-space replace algebra byte-for-byte"
    ),
)
def z123(spark, sf_dir):
    from ..operators.bpe import SHIPPED_MERGES, bpe_segment

    docs = load(spark, "documents", sf_dir)
    return bpe_segment(docs, SHIPPED_MERGES).select(
        "doc_id", "n_bpe_tokens"
    )


@query(
    "z124_pack_manifest",
    oracle="""
WITH t AS (
  SELECT doc_id, source,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(lower(text)), '\\s+')) END
             AS n_tokens
  FROM documents),
p AS (
  SELECT doc_id, source, n_tokens,
         (sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) - n_tokens)
             AS before
  FROM t),
b AS (
  SELECT doc_id, source, n_tokens, before, (before // 64) AS bin_id
  FROM p)
SELECT doc_id, source, n_tokens::INT AS n_tokens, bin_id::BIGINT AS bin_id,
       (before - min(before) OVER (PARTITION BY source, bin_id))::INT
           AS begin_offset
FROM b
""",
    description=(
        "per-document sequence-packing PLACEMENT manifest (the loader "
        "handoff pack_token_bins' bin stats don't carry): bin_id + "
        "begin_offset locate every doc's tokens in its packed buffer, "
        "the spans a block-diagonal attention mask is built from. "
        "Per-part running count is TWO-LEVEL (rows window inside "
        "(part, id-bucket) + bounded bucket-offset window, the z90 "
        "discipline) -- no whole-part single-partition window; the "
        "offset window partitions by budget-bounded (part, bin)"
    ),
)
def z124(spark, sf_dir):
    from ..operators.train_prep import pack_manifest

    return pack_manifest(load(spark, "documents", sf_dir), budget=64)


@query(
    "z125_length_batches",
    oracle="""
WITH t AS (
  SELECT doc_id, source,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(lower(text)), '\\s+')) END
             AS n_tokens
  FROM documents),
r AS (
  SELECT source, n_tokens,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_tokens, doc_id) AS rk
  FROM t)
SELECT source, ((rk - 1) // 8)::BIGINT AS batch_id,
       count(*)::INT AS n_docs,
       max(n_tokens)::INT AS max_tokens,
       sum(n_tokens)::BIGINT AS sum_tokens,
       (count(*) * max(n_tokens))::BIGINT AS padded_tokens,
       (count(*) * max(n_tokens) - sum(n_tokens))::BIGINT AS waste_tokens
FROM r GROUP BY 1, 2
""",
    description=(
        "length-bucketed dynamic batching: per part, docs sort by "
        "(n_tokens, id) into fixed-count batches so each pads to ITS "
        "max; per-batch padding waste is exact-integer accounting. "
        "Per-part rank is two-level (rows window inside (part, "
        "length-range bucket) + bounded bucket-offset window) -- no "
        "whole-part single-partition window"
    ),
)
def z125(spark, sf_dir):
    from ..operators.train_prep import length_batches

    return length_batches(load(spark, "documents", sf_dir), batch_size=8)


@query(
    "z126_html_to_text",
    oracle="WITH aug AS (\n"
    "  SELECT doc_id,\n"
    "         '<html><head><title>t</title>'\n"
    "         || '<style>p { color: red; }</style>'\n"
    "         || '<script>var x = 1 < 2;</script></head>'\n"
    "         || '<body><h1>Doc ' || doc_id || '</h1>'\n"
    "         || '<!-- hidden -->'\n"
    "         || '<p>' || text || ' &amp;amp; more&nbsp;<b>bold</b></p>'\n"
    "         || '<ul><li>a</li><li>b</li></ul></body></html>' AS t\n"
    "  FROM documents)\n"
    "SELECT doc_id, "
    + text.html_to_text_oracle_sql_expr("t")
    + " AS extracted FROM aug",
    description=(
        "markup-stripping text extraction (the trafilatura-shaped web-"
        "corpus step): script/style/comment blocks dropped, block tags "
        "become newlines, remaining tags stripped, entities decoded "
        "(&amp; last -- one decode pass), whitespace normalized. One "
        "shared RE2-compatible pattern table drives BOTH engines, so "
        "extraction is gated byte-for-byte; pure regexp codegen, zero "
        "shuffle"
    ),
)
def z126(spark, sf_dir):
    docs = load(spark, "documents", sf_dir)
    aug = docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><head><title>t</title>"
                  "<style>p { color: red; }</style>"
                  "<script>var x = 1 < 2;</script></head>"
                  "<body><h1>Doc "),
            F.col("doc_id").cast("string"),
            F.lit("</h1><!-- hidden --><p>"),
            F.col("text"),
            F.lit(" &amp;amp; more&nbsp;<b>bold</b></p>"
                  "<ul><li>a</li><li>b</li></ul></body></html>"),
        ).alias("t"),
    )
    return text.html_to_text(aug, text_col="t").select("doc_id", "extracted")


@query(
    "z127_unicode_fold",
    oracle="WITH aug AS (\n"
    "  SELECT doc_id,\n"
    "         '“Smart” — quotes… ＦＵＬＬ ﬁn «q» ' || text AS t\n"
    "  FROM documents)\n"
    "SELECT doc_id, "
    + text.unicode_fold_oracle_sql_expr("t")
    + " AS folded FROM aug",
    description=(
        "unicode compatibility fold (NFKC-lite): smart quotes/dashes, "
        "fullwidth ASCII, exotic spaces, ellipsis/ligature/guillemet "
        "expansions -- the normalization that must run BEFORE content "
        "hashing so typographic variants dedup together. One shared "
        "mapping table drives translate/replace in both engines "
        "byte-for-byte; pure codegen, zero shuffle"
    ),
)
def z127(spark, sf_dir):
    docs = load(spark, "documents", sf_dir)
    aug = docs.select(
        "doc_id",
        F.concat(
            F.lit("“Smart” — quotes… "
                  "ＦＵＬＬ ﬁn «"
                  "q» "),
            F.col("text"),
        ).alias("t"),
    )
    return text.unicode_fold(aug, text_col="t").select("doc_id", "folded")


# ---------------------------------------------------------------------
# Probe-only at-rest retrieval entries (VERDICT r10 #4): z36/z66 price
# the scan-form ranking; these price the RECURRING cost of the same
# queries served from a cached write_posting_index layout -- the z115
# build/probe split applied to the text-index family. First call builds
# the index (cached_index fingerprints the source parquet); bench
# repeat>=2 min-of-N reports the probe-only steady state.
# ---------------------------------------------------------------------


def _z_posting_index(spark, sf_dir: str, positional: bool) -> str:
    kind = "posting_index_pos" if positional else "posting_index_tf"

    def build(path: str) -> None:
        text.write_posting_index(
            load(spark, "documents", sf_dir), path, positional=positional
        )

    return cached_index(sf_dir, kind, "documents", build)


@query(
    "z128_bm25_indexed",
    # probe results are bit-identical to the scan form (equivalence also
    # pinned operator-level in tests), so the oracle is z36's -- but the
    # gated output carries RANK, not the rounded-double score
    # (EXACT_ROUND_FROZEN is frozen; the z120 discipline)
    oracle="WITH ranked AS ("
    + _bm25_sql(["merge", "window", "partition"], _TOKENS_SQL)
    + """)
SELECT doc_id,
       (row_number() OVER (ORDER BY bm25 DESC, doc_id))::INT AS rank
FROM ranked
""",
    description=(
        "BM25 ranked retrieval served from the AT-REST posting index "
        "(recurring-cost twin of z36): bucket-pruned posting read "
        "(|terms|/n_buckets of an index that never contains the corpus "
        "text), per-term df recomputed exactly from the pruned "
        "postings, fixed-order score expression -- bit-identical to the "
        "scan form, priced probe-only against a fingerprint-cached "
        "index; gated output is the rank order (ints), scores stay "
        "internal"
    ),
)
def z128(spark, sf_dir):
    path = _z_posting_index(spark, sf_dir, positional=False)
    ranked = text.bm25_indexed(
        spark, path, terms=["merge", "window", "partition"]
    )
    # rank window runs over the limit(k)-bounded top-k rows only
    w = W.orderBy(F.desc("bm25"), F.asc("doc_id"))
    return ranked.select(
        "doc_id", F.row_number().over(w).cast("int").alias("rank")
    )


@query(
    "z129_phrase_search_indexed",
    # probe equals the scan form bit-for-bit, so the oracle is z66's
    oracle=f"""
WITH d AS (SELECT doc_id, {_TOKENS_SQL} AS w FROM documents),
p AS (
  SELECT doc_id,
         len(list_intersect(
           [p + 1 for p in
             [i for i in generate_series(1, len(w)) if w[i] = 'window']],
           [i for i in generate_series(1, len(w)) if w[i] = 'join']))
           AS n_matches
  FROM d)
SELECT doc_id, n_matches FROM p WHERE n_matches > 0
ORDER BY n_matches DESC, doc_id LIMIT 20
""",
    description=(
        "exact phrase retrieval served from the AT-REST positional "
        "posting index (recurring-cost twin of z66): bucket-pruned to "
        "the phrase terms, gap-encoded position lists decoded on "
        "candidates only, same positions+1 intersection fold -- "
        "bit-identical to the scan form, priced probe-only against a "
        "fingerprint-cached index"
    ),
)
def z129(spark, sf_dir):
    path = _z_posting_index(spark, sf_dir, positional=True)
    return text.phrase_search_indexed(
        spark, path, phrase=["window", "join"]
    )


@query(
    "z131_hll_distinct",
    oracle=_sketch.hll_oracle_sql("text", p=6, group_by="source"),
    description=(
        "HyperLogLog distinct sketch (Flajolet et al. 2007) with the "
        "in-gate accuracy eval: per-source register table (m=64 "
        "registers, 48-bit md5 hash, rho via exact bin()-length integer "
        "algebra -- no log2 transcendental), raw harmonic-mean estimate "
        "as ONE exact DECIMAL(38,0) floor division, exact distinct + "
        "per-mille error riding along. One corpus scan, map-side-"
        "combined (group, register) aggregate: the shuffle payload is "
        "O(m x partitions) however large the corpus, and registers "
        "merge across days/partials by elementwise MAX -- the 1-byte-"
        "per-register state that monitors distinct counts on a 100 TB "
        "stream"
    ),
)
def z131(spark, sf_dir):
    return _sketch.hll_distinct(
        load(spark, "documents", sf_dir), "text", p=6, group_by="source"
    )


# BM25 side stays disjunctive over 3 terms; the conjunctive system uses
# the 2-term subset -- the 3-term conjunction matches ZERO docs at every
# SF (checked with duckdb; the branch-degeneracy trap in NOTES.md), and
# a fusion where one system is empty is just the other system renamed
_RRF_TERMS = ["merge", "window", "partition"]
_RRF_KW_TERMS = ["merge", "window"]
_RRF_KW_TERMS_SQL = "('merge', 'window')"


@query(
    "z133_hybrid_rrf",
    # the two systems' SQL twins (z36's BM25, z35's conjunctive keyword
    # rank widened to 3 terms) feed the same exact-integer RRF algebra:
    # 10^6 div (60 + rank) summed per doc, ties (score desc, id)
    oracle="WITH bm AS ("
    + _bm25_sql(_RRF_TERMS, _TOKENS_SQL)
    + f"""),
bm_r AS (
  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rnk
  FROM bm),
tok AS (SELECT doc_id, unnest({_TOKENS_SQL}) AS w FROM documents),
hits AS (SELECT doc_id, w FROM tok WHERE w IN {_RRF_KW_TERMS_SQL}),
g AS (SELECT doc_id, count(DISTINCT w) AS nterms, count(*) AS total_tf
      FROM hits GROUP BY doc_id),
kw AS (SELECT doc_id, total_tf FROM g WHERE nterms = 2
       ORDER BY total_tf DESC, doc_id LIMIT 20),
kw_r AS (
  SELECT doc_id, row_number() OVER (ORDER BY total_tf DESC, doc_id) AS rnk
  FROM kw),
u AS (
  SELECT doc_id, 1000000 // (60 + rnk) AS s FROM bm_r
  UNION ALL
  SELECT doc_id, 1000000 // (60 + rnk) AS s FROM kw_r),
fused AS (
  SELECT doc_id, sum(s)::BIGINT AS rrf_micros, count(*)::INT AS n_systems
  FROM u GROUP BY doc_id),
out AS (
  SELECT *, (row_number() OVER (ORDER BY rrf_micros DESC, doc_id))::INT
              AS rank
  FROM fused)
SELECT doc_id, rrf_micros, n_systems, rank FROM out WHERE rank <= 10
""",
    description=(
        "hybrid-retrieval reciprocal-rank fusion (Cormack et al. SIGIR "
        "2009, the production RAG combiner): 3-term disjunctive BM25 "
        "top-20 fused with 2-term conjunctive exact-tf top-20 (the "
        "3-term conjunction is corpus-degenerate -- checked, NOTES.md "
        "trap) via score = sum of "
        "10^6 div (60 + rank) in exact integer micros. Each system's "
        "rank window runs over its LIMIT-bounded result only; fusion is "
        "one union + map-side-combined doc-keyed sum -- O(sum of k) "
        "whatever the corpus size. n_systems rides along so consumers "
        "see which docs both retrievers agree on"
    ),
)
def z133(spark, sf_dir):
    docs = load(spark, "documents", sf_dir)
    bm = text.bm25_rank(docs, terms=_RRF_TERMS)
    kw = text.keyword_search(docs, terms=_RRF_KW_TERMS)
    return text.rrf_fuse(
        [
            (bm, (F.desc("bm25"), F.asc("doc_id"))),
            (kw, (F.desc("total_tf"), F.asc("doc_id"))),
        ],
        rrf_k=60,
        top=10,
    )


# Deterministic web-artifact injection for z141 (the q88 PII-fixture
# precedent): the synthetic corpus is clean lowercase prose, so the
# bullet/ellipsis/symbol/alpha rules would be degenerate on raw text.
# Both engines build the SAME augmented column from table values.
_Z141_AUG_SQL = """
SELECT doc_id, text
  || CASE WHEN doc_id % 7 = 0
          THEN chr(10) || '- bullet item one' || chr(10) || '- bullet item two'
          ELSE '' END
  || CASE WHEN doc_id % 11 = 0 THEN chr(10) || 'to be continued...' ELSE '' END
  || CASE WHEN doc_id % 13 = 0 THEN ' ## 1234 5678 999' ELSE '' END AS text
FROM documents
"""

from ..operators.text import gopher_oracle_sql as _gopher_sql  # noqa: E402


@query(
    "z141_gopher_rules",
    oracle=_gopher_sql(_Z141_AUG_SQL),
    description=(
        "Gopher-style quality rule battery (Rae et al. 2021 shape -- "
        "the standard pre-training corpus filter): word-count bounds, "
        "mean-word-length bounds, stop-word evidence, distinct-word "
        "(repetition) fraction, symbol-to-word ratio, bullet-line and "
        "ellipsis-line ratios, alphabetic-word fraction -- per-doc "
        "pass/fail flag PER RULE plus the conjunctive keep, because "
        "corpus triage needs 'which rule kills crawl X'. Every rule is "
        "a denominator-cleared integer comparison (no division, no "
        "float anywhere); web artifacts the clean corpus lacks are "
        "injected deterministically from doc_id (q88 precedent). One "
        "row-local scan-stage pass: no shuffle, no join, no window"
    ),
)
def z141(spark, sf_dir):
    from ..operators.text import gopher_quality

    docs = load(spark, "documents", sf_dir)
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.lit("\n- bullet item one\n- bullet item two"),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 0, F.lit("\nto be continued...")
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 13 == 0, F.lit(" ## 1234 5678 999")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return gopher_quality(aug)


from ..operators.train_prep import (  # noqa: E402
    importance_weights_oracle_sql as _dsir_sql,
)


@query(
    "z143_importance_weights",
    oracle=_dsir_sql("source = 'src0'"),
    description=(
        "hashed-n-gram importance weights for data selection -- the "
        "DSIR shape (Xie et al. 2023) with the likelihood ratio in "
        "exact integer micros instead of float log space: distinct "
        "hashed word bigrams per doc (md5-prefix mod 8192), ONE "
        "feature-keyed aggregate yields target (src0) and pool document "
        "frequencies, add-one-smoothed odds per feature as a HALF_UP "
        "integer ratio, per-doc score = integer sum over its features "
        "(partition-order-free). The bounded 8192-row weight table is "
        "broadcast back; the only corpus-scale shuffles are the explode "
        "and the doc-keyed sum"
    ),
)
def z143(spark, sf_dir):
    from ..operators.train_prep import importance_weights

    return importance_weights(
        load(spark, "documents", sf_dir), F.col("source") == "src0"
    )


from ..operators.text import sentence_stats_oracle_sql as _sent_sql  # noqa: E402

# deterministic punctuation fixture (the corpus is punctuation-free;
# q88/z141 precedent): replace() is non-overlapping left-to-right in
# both engines
_Z149_AUG_SQL = """
SELECT doc_id,
       replace(replace(text, ' data ', '. Data '),
               ' join ', '! Join ') AS text
FROM documents
"""


@query(
    "z149_sentence_stats",
    oracle=_sent_sql(_Z149_AUG_SQL),
    description=(
        "rule-based sentence segmentation + per-doc length stats "
        "(readability features beside the z141 Gopher battery; chunk "
        "boundaries a RAG splitter respects): lookahead-free "
        "terminator+space split shared verbatim by both engines "
        "(q79/z126 rule), per-sentence word counts from ONE in-row "
        "transform over the materialized sentence array, mean as exact "
        "HALF_UP micros. Punctuation injected deterministically (the "
        "corpus has none -- q88 precedent). Pure scan-stage pass"
    ),
)
def z149(spark, sf_dir):
    from ..operators.text import sentence_stats

    docs = load(spark, "documents", sf_dir)
    aug = docs.select(
        "doc_id",
        F.replace(
            F.replace(F.col("text"), F.lit(" data "), F.lit(". Data ")),
            F.lit(" join "),
            F.lit("! Join "),
        ).alias("text"),
    )
    return sentence_stats(aug)


# ---------------------------------------------------------------------
# URL canonicalization + per-domain corpus rollup (VERDICT r11 #3: the
# CCNet-style domain grouping). The corpus has no URL column, so both
# engines synthesize the SAME url string from table values (q88/z141
# injection precedent) -- five variants covering case folding, default
# and non-default ports, tracking params, fragments, scheme-less
# references, mirror-prefix hosts, and a second-level TLD.
# ---------------------------------------------------------------------

from ..operators import web as _web  # noqa: E402

_Z167_URL_SQL = """
SELECT doc_id, n_chars,
  CASE doc_id % 5
    WHEN 0 THEN 'HTTPS://WWW.' || source || '.COM:443/d/' || doc_id
                || '?utm_source=feed&id=' || doc_id
    WHEN 1 THEN 'http://m.' || source || '.org:8080/a/' || (doc_id % 7)
                || '?b=2&a=1&ref=tw'
    WHEN 2 THEN 'https://cdn.' || source || '.co.uk/x/y.html#sec' || doc_id
    WHEN 3 THEN source || '.net/plain'
    ELSE 'http://' || source || '.com:80/q?z=9&utm_campaign=x&y=1#f'
  END AS url
FROM documents
"""

_Z167_HOST_SQL = _web.canonical_host_sql("url")


def _z167_url_col():
    d = F.col("doc_id")
    s = F.col("source")
    ds = d.cast("string")
    return (
        F.when(
            d % 5 == 0,
            F.concat(
                F.lit("HTTPS://WWW."), s, F.lit(".COM:443/d/"), ds,
                F.lit("?utm_source=feed&id="), ds,
            ),
        )
        .when(
            d % 5 == 1,
            F.concat(
                F.lit("http://m."), s, F.lit(".org:8080/a/"),
                (d % 7).cast("string"), F.lit("?b=2&a=1&ref=tw"),
            ),
        )
        .when(
            d % 5 == 2,
            F.concat(
                F.lit("https://cdn."), s, F.lit(".co.uk/x/y.html#sec"), ds
            ),
        )
        .when(d % 5 == 3, F.concat(s, F.lit(".net/plain")))
        .otherwise(
            F.concat(
                F.lit("http://"), s,
                F.lit(".com:80/q?z=9&utm_campaign=x&y=1#f"),
            )
        )
        .alias("url")
    )


@query(
    "z167_url_canonicalize",
    oracle=f"""
WITH u AS ({_Z167_URL_SQL}),
h AS MATERIALIZED (
  SELECT doc_id, url, {_Z167_HOST_SQL} AS host FROM u)
SELECT doc_id,
       {_web.canonical_url_sql('url')} AS canonical_url,
       host,
       {_web.registered_domain_sql('host')} AS domain
FROM h
""",
    description=(
        "URL canonicalization (CCNet/crawl-frontier shape): fold "
        "scheme+host case, peel www/m/mobile mirror prefixes, drop "
        "default ports (80/http, 443/443https) but keep real ones, drop "
        "fragments, strip tracking params (utm_*/ref/fbclid/gclid "
        "family) and SORT the survivors so param order never splits a "
        "dedup key, reduce the host to its registered domain with a "
        "second-level-TLD rule (co.uk family). Pure regexp/array "
        "codegen projection -- zero shuffle; both engines build the "
        "same expressions from one frozen constant set"
    ),
)
def z167(spark, sf_dir):
    docs = load(spark, "documents", sf_dir)
    return _web.canonicalize_urls(
        docs.select("doc_id", _z167_url_col())
    )


@query(
    "z168_domain_stats",
    oracle=f"""
WITH u AS ({_Z167_URL_SQL}),
h AS MATERIALIZED (
  SELECT doc_id, n_chars, {_Z167_HOST_SQL} AS host FROM u),
dom AS (
  SELECT doc_id, n_chars, host,
         {_web.registered_domain_sql('host')} AS domain
  FROM h),
g AS ({_gopher_sql(_Z141_AUG_SQL)})
SELECT domain,
       count(*)::BIGINT AS n_docs,
       count(DISTINCT host)::BIGINT AS n_hosts,
       sum(n_chars)::BIGINT AS total_chars,
       sum(CASE WHEN g.keep THEN 1 ELSE 0 END)::BIGINT AS n_keep
FROM dom JOIN g USING (doc_id)
GROUP BY domain
""",
    description=(
        "per-registered-domain corpus rollup composing z167's URL "
        "canonicalization with z141's Gopher rule battery: docs, "
        "distinct hosts, total chars, and quality survivors per domain "
        "-- the table crawl curation reads to up/down-sample domains. "
        "ONE aggregate keyed by domain (bounded by the domain universe, "
        "not corpus size) after a doc_id equi-join of two scan-stage "
        "projections; exact integers only"
    ),
)
def z168(spark, sf_dir):
    from ..operators.text import gopher_quality

    docs = load(spark, "documents", sf_dir)
    dom = _web.canonicalize_urls(
        docs.select("doc_id", _z167_url_col())
    ).select("doc_id", "host", "domain")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.lit("\n- bullet item one\n- bullet item two"),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 0, F.lit("\nto be continued...")
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 13 == 0, F.lit(" ## 1234 5678 999")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    keep = gopher_quality(aug).select("doc_id", "keep")
    joined = (
        dom.join(keep, "doc_id")
        .join(docs.select("doc_id", "n_chars"), "doc_id")
    )
    return _web.domain_stats(joined)


@query(
    "z176_vocab_growth",
    oracle=f"""
WITH tok AS (
  SELECT doc_id // 50 AS bucket, unnest({_TOKENS_SQL}) AS token
  FROM documents),
per AS (
  SELECT bucket, count(*)::BIGINT AS n_occurrences,
         count(DISTINCT token)::BIGINT AS n_types
  FROM tok GROUP BY bucket),
fst AS (SELECT token, min(bucket) AS fb FROM tok GROUP BY token),
novel AS (SELECT fb AS bucket, count(*)::BIGINT AS n_novel_types
          FROM fst GROUP BY fb)
SELECT p.bucket, p.n_occurrences, p.n_types,
       coalesce(n.n_novel_types, 0)::BIGINT AS n_novel_types,
       (sum(coalesce(n.n_novel_types, 0))
          OVER (ORDER BY p.bucket ROWS UNBOUNDED PRECEDING))::BIGINT
         AS cum_vocab
FROM per p LEFT JOIN novel n USING (bucket)
""",
    description=(
        "vocabulary growth curve over ingest order (Heaps-law "
        "observability): per doc_id-div-50 batch, token occurrences, "
        "distinct types, NOVEL types (first global occurrence in this "
        "batch: one min-bucket aggregate per token -- never a "
        "batch-vs-history join), and the cumulative vocabulary -- the "
        "number a crawl tracks to see a source go stale (novel-type "
        "rate collapsing) or a scrape loop duplicating itself. Two "
        "token-keyed map-side-combined aggregates; the only window "
        "runs on the BATCH axis (corpus/50 rows, bounded). Exact "
        "integers"
    ),
)
def z176(spark, sf_dir):
    from ..functions.xhash import ws_tokens

    docs = load(spark, "documents", sf_dir)
    tok = docs.select(
        F.expr("doc_id div 50").alias("bucket"),
        F.explode(ws_tokens(F.col("text"))).alias("token"),
    )
    per = tok.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        F.countDistinct("token").cast("long").alias("n_types"),
    )
    novel = (
        tok.groupBy("token")
        .agg(F.min("bucket").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_novel_types"))
    )
    j = per.join(novel, "bucket", "left").fillna({"n_novel_types": 0})
    w = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, 0)
    return j.select(
        "bucket", "n_occurrences", "n_types", "n_novel_types",
        F.sum("n_novel_types").over(w).cast("long").alias("cum_vocab"),
    )


from ..operators.text import pmi_collocations_oracle_sql as _pmi_sql  # noqa: E402


@query(
    "z179_pmi_collocations",
    oracle=_pmi_sql(min_count=3),
    description=(
        "bigram collocation mining by pointwise mutual information, "
        "reported as the exact integer-micros LIFT ratio p(ab)/"
        "(p(a)p(b)) -- PMI = log2(lift) is monotone, so thresholding/"
        "ranking on the cleared-integer lift carries zero float (the "
        "exactnum discipline). The phrase-discovery pass word2vec-style "
        "pipelines run before tokenizer/vocab training. One in-row "
        "bigram explode + two count aggregates + two equi-joins; "
        "min_count prunes the hapax tail BEFORE the joins; DECIMAL(38,0) "
        "products with the magnitude bound documented on the operator"
    ),
)
def z179(spark, sf_dir):
    from ..operators.text import pmi_collocations

    return pmi_collocations(load(spark, "documents", sf_dir), min_count=3)


from ..operators.web import (  # noqa: E402
    link_domain_rollup_oracle_sql as _linkroll_sql,
)

# deterministic outlink injection (the corpus has no link column --
# q88/z141/z167 precedent): source page = the z167 URL; target drawn
# from the same srcK label universe, keyed off n_chars (which varies
# freely per doc, unlike doc_id whose residues run in lockstep with the
# source label) so per-domain outlink shares genuinely vary, domain
# pairs overlap, reciprocal pairs occur, and all three TLD shapes
# (com / co.uk / bare .net reference) appear on the target side.
_Z182_LINKS_SQL = f"""
WITH u AS ({_Z167_URL_SQL})
SELECT url AS src_url,
  CASE n_chars % 3
    WHEN 0 THEN 'https://www.src' || (n_chars % 20)
                || '.com/ref/' || doc_id
    WHEN 1 THEN 'http://m.src' || ((n_chars * 7 + 2) % 20)
                || '.co.uk/a?x=1'
    ELSE 'src' || ((doc_id * 11 + 5) % 20) || '.net/b'
  END AS dst_url
FROM u
"""


@query(
    "z182_link_domain_rollup",
    oracle=_linkroll_sql(_Z182_LINKS_SQL),
    description=(
        "registered-domain link-graph rollup (the cross-domain half of "
        "crawl curation z168 doesn't see): per (src_domain, dst_domain) "
        "pair -- external links, DISTINCT source pages (sitewide "
        "boilerplate collapses), reciprocal-pair flag (the link-"
        "exchange/spam-ring tell), and the pair's exact HALF_UP share "
        "of the source domain's outlinks. One canonicalization "
        "projection + one pair-keyed agg; everything after runs on the "
        "domain-pair table (bounded by the domain universe squared, "
        "never link volume) incl. the reversal self-join"
    ),
)
def z182(spark, sf_dir):
    from ..operators.web import link_domain_rollup

    docs = load(spark, "documents", sf_dir)
    d = F.col("doc_id")
    nc = F.col("n_chars")
    dst = (
        F.when(
            nc % 3 == 0,
            F.concat(
                F.lit("https://www.src"),
                (nc % 20).cast("string"),
                F.lit(".com/ref/"),
                d.cast("string"),
            ),
        )
        .when(
            nc % 3 == 1,
            F.concat(
                F.lit("http://m.src"),
                ((nc * 7 + 2) % 20).cast("string"),
                F.lit(".co.uk/a?x=1"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("src"),
                ((d * 11 + 5) % 20).cast("string"),
                F.lit(".net/b"),
            )
        )
    )
    links = docs.select(
        _z167_url_col().alias("src_url"), dst.alias("dst_url")
    )
    return link_domain_rollup(links)


from ..operators.text import (  # noqa: E402
    quantile_normalize_oracle_sql as _qnorm_sql,
)


@query(
    "z183_source_quantile_norm",
    oracle=_qnorm_sql(
        "SELECT doc_id, source, "
        "len(string_split_regex(trim(lower(text)), '\\s+')) AS score "
        "FROM documents"
    ),
    description=(
        "per-source quantile normalization of a quality score (word "
        "count): each doc's MID-RANK percentile within its source in "
        "exact HALF_UP micros -- the cross-source comparability move "
        "('keep each source's top 60%' thresholds read this). Computes "
        "on the (source, score) HISTOGRAM: count agg + prefix-sum "
        "window over the bounded score axis (the z175 discipline -- "
        "never a corpus-sized partitionBy(source) row_number) + one "
        "equi-join back to rows; mid-rank makes the percentile a "
        "function of the score value, which is what makes the "
        "histogram form exact"
    ),
)
def z183(spark, sf_dir):
    from ..functions.xhash import ws_tokens
    from ..operators.text import quantile_normalize_scores

    docs = load(spark, "documents", sf_dir)
    return quantile_normalize_scores(
        docs, F.size(ws_tokens(F.col("text")))
    )


from ..operators.constraints import (  # noqa: E402
    classification_report_oracle_sql as _clsrep_sql,
)
from .base import _langid_oracle as _langid_sql  # noqa: E402

# deterministic language-marker injection (the corpus text is English-
# shaped regardless of its lang label -- without markers every doc
# predicts 'en' and the eval is degenerate; q88/z141 precedent). Docs
# with doc_id % 7 == 0 stay UNMARKED, so the confusion matrix keeps a
# real off-diagonal (unmarked de/es/fr/zh docs fall back to 'en').
# Marker lexicon choices avoid cross-language lexicon collisions except
# the deliberate la/un overlaps, which the 8-vs-2 hit counts dominate.
_Z184_MARKERS = {
    "de": " der die und ist nicht ein mit das",
    "es": " el la que y en un es de",
    "fr": " le la et les des un une est",
    "zh": " 汉字汉字汉字汉字汉字汉字",
}
_Z184_AUG_SQL = "SELECT doc_id, text || CASE WHEN doc_id % 7 = 0 THEN '' " + (
    "ELSE CASE lang "
    + " ".join(
        f"WHEN '{lang}' THEN '{m}'" for lang, m in sorted(_Z184_MARKERS.items())
    )
    + " ELSE '' END END AS text FROM documents"
)


@query(
    "z184_langid_confusion_prf",
    oracle=_clsrep_sql(
        f"SELECT d.lang AS truth, o.pred_lang AS pred "
        f"FROM ({_langid_sql(_Z184_AUG_SQL)}) o "
        f"JOIN documents d USING (doc_id)"
    ),
    description=(
        "classifier eval as a first-class verified query: per-class "
        "precision/recall/F1 of the q36 language-ID heuristic against "
        "the ground-truth lang column over marker-injected text (6/7 "
        "of non-English docs carry their language's stopword marker; "
        "the unmarked seventh falls back to 'en', keeping a real "
        "off-diagonal), in exact HALF_UP micros -- eval numbers feed "
        "regression gates, where float drift is as damaging as in the "
        "data. Zero-denominator cells are NULL, never a fake 0; "
        "phantom prediction-only classes still get a row. ONE "
        "(truth, pred) aggregate over corpus rows, then everything "
        "runs on the bounded confusion table"
    ),
)
def z184(spark, sf_dir):
    from ..operators.constraints import classification_report

    docs = load(spark, "documents", sf_dir)
    marker = F.lit("")
    for lang, m in sorted(_Z184_MARKERS.items()):
        marker = F.when(F.col("lang") == lang, F.lit(m)).otherwise(marker)
    aug = docs.select(
        "doc_id",
        "lang",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 7 == 0, F.lit("")).otherwise(marker),
        ).alias("text"),
    )
    pred = text.with_lang_id(aug, keep_cols=["lang"])
    return classification_report(pred, "lang", "pred_lang")


from ..operators.constraints import (  # noqa: E402
    score_calibration_oracle_sql as _calib_sql,
)

# the z194 probability-like score: share of whitespace tokens in the en
# stopword lexicon, as exact HALF_UP micros (the q36 en-ness signal
# reframed as P(en)); label = the ground-truth lang column
_Z194_EN_LEX_SQL = "['the','a','of','and','to','in','is','that']"
_Z194_ROWS_SQL = f"""
SELECT ((2000000 * hits + ntok) // (2 * ntok))::BIGINT AS score_micros,
       (lang = 'en') AS label
FROM (
  SELECT len(list_filter({_TOKENS_SQL},
                         w -> list_contains({_Z194_EN_LEX_SQL}, w)))::BIGINT
           AS hits,
         greatest(len({_TOKENS_SQL}), 1)::BIGINT AS ntok,
         lang
  FROM documents)
"""


@query(
    "z194_score_calibration_ece",
    oracle=_calib_sql(_Z194_ROWS_SQL, n_bins=10),
    description=(
        "expected calibration error of the en-stopword-share score "
        "against the ground-truth lang label -- the 'can I trust 0.9 "
        "to mean 90%' gate run before a classifier threshold is "
        "promoted to a corpus filter (z184 grades the ARGMAX; this "
        "grades the SCORE). The per-bin weighted gaps telescope to ONE "
        "clearable HALF_UP division -- sum_b |S_b - 1e6*P_b| over N -- "
        "plus one exact HALF_UP per observed bin for the sup-gap, so "
        "both engines match bit-for-bit with zero per-row float. One "
        "10-ary count/sum aggregate over corpus rows, then a 1-row "
        "re-aggregate of the bin table"
    ),
)
def z194(spark, sf_dir):
    from ..functions.exactnum import ratio_micros_halfup
    from ..functions.xhash import ws_tokens
    from ..operators.constraints import score_calibration
    from ..operators.text import LANG_LEXICONS

    docs = load(spark, "documents", sf_dir)
    # project the token array ONCE (the word_shingles PERF CONTRACT:
    # unmaterialized array builders re-evaluate per consumer)
    pre = docs.select(ws_tokens(F.col("text")).alias("_toks"), "lang")
    en = F.array(*[F.lit(w) for w in LANG_LEXICONS["en"]])
    hits = F.size(
        F.filter(F.col("_toks"), lambda w: F.array_contains(en, w))
    )
    n_tok = F.greatest(F.size(F.col("_toks")), F.lit(1))
    score = ratio_micros_halfup(
        hits.cast("long"), n_tok.cast("long")
    )
    return score_calibration(
        pre, score, F.col("lang") == "en", n_bins=10
    )


from ..operators.sketch import (  # noqa: E402
    heavy_hitters_oracle_sql as _hh_sql,
)


@query(
    "z195_heavy_hitters_twopass",
    oracle=_hh_sql(
        f"SELECT unnest({_TOKENS_SQL}) AS key FROM documents",
        key_sql="key",
        k=20,
        capacity=256,
    ),
    description=(
        "EXACT top-20 tokens WITHOUT a full-cardinality shuffle: "
        "per-partition Misra-Gries summaries (Arrow mapInPandas, <= "
        "256 counters each) -> candidate keys -> broadcast exact "
        "recount -> top-k. z61 answers the same question with the "
        "plain explode+groupBy plan that shuffles one slot per "
        "DISTINCT key; this is the two-pass plan whose shuffle is "
        "bounded by partitions x capacity regardless of vocabulary "
        "size (the web-scale token/domain/user-count shape). Output "
        "still exact, not approximate: the mergeable MG bound "
        "(undercount <= N/257) makes every key above the support "
        "bound CERTAIN to survive pass 1, exact pass-2 recounts "
        "replace the undercounts, and the support-bound filter makes "
        "the result a pure function of the data (phi-heavy hitters, "
        "phi = 1/257) -- partitioning can never leak into the answer"
    ),
)
def z195(spark, sf_dir):
    from ..functions.xhash import ws_tokens
    from ..operators.sketch import heavy_hitters_twopass

    docs = load(spark, "documents", sf_dir)
    toks = docs.select(F.explode(ws_tokens(F.col("text"))).alias("tok"))
    return heavy_hitters_twopass(toks, "tok", k=20, capacity=256)


from ..operators.sketch import (  # noqa: E402
    subsample_median_ci_oracle_sql as _medci_sql,
)


@query(
    "z198_subsample_median_ci",
    oracle=_medci_sql(
        "SELECT doc_id, n_chars FROM documents",
        value_sql="n_chars",
        id_sql="doc_id",
        n_replicates=32,
    ),
    description=(
        "sampling error bar on the corpus median doc length: 32 "
        "deterministic md5-keyed half-subsamples (Politis-Romano "
        "subsampling -- the resampling family member that is an exact "
        "pure function of the data; a multinomial bootstrap's per-row "
        "weights are engine-hostile), lower-median per replicate via "
        "the z175 HISTOGRAM median, CI = 4th/29th replicate-median "
        "order statistics. The 'did the median move or did we just "
        "sample differently' answer every snapshot diff needs. Only "
        "corpus-sized work is one projected x32 expansion into a "
        "map-side-combined histogram; all windows run on the value / "
        "replicate axes. All-BIGINT output"
    ),
)
def z198(spark, sf_dir):
    from ..operators.sketch import subsample_median_ci

    docs = load(spark, "documents", sf_dir)
    return subsample_median_ci(
        docs, "n_chars", "doc_id", n_replicates=32
    )


from ..operators.text import (  # noqa: E402
    tokenizer_fertility_oracle_sql as _fert_sql,
)


# the synthetic corpus is pure space-separated words (fertility would
# be EXACTLY 1.0 for every language -- degenerate), so the leg injects
# a deterministic ' #<doc_id>' marker per doc (the z184 augmentation
# rule): one extra whitespace word, two extra BPE runs (' #' + digits),
# with per-language doc-length sums making the ratio discriminate.
_Z199_ROWS_SQL = (
    "SELECT doc_id, text || ' #' || doc_id AS text, lang FROM documents"
)


@query(
    "z199_tokenizer_fertility",
    oracle=_fert_sql(
        _TOKENS_SQL,
        "' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \\t\\n\\r]+'",
        group_sql="lang",
        rows_sql=_Z199_ROWS_SQL,
    ),
    description=(
        "tokenizer fertility by language (BPE-ish pre-tokens per "
        "whitespace word + chars per BPE token, on group SUMS) -- the "
        "multilinguality cost metric: a 2x-fertility language pays 2x "
        "context and serving budget for the same text, and "
        "doc-balanced mixing silently under-represents it in TOKEN "
        "space (the axis z92/z28 mixing policies should read). q79's "
        "per-doc counts rolled up per group, exact HALF_UP micros "
        "over cleared group sums, never an average of per-doc "
        "ratios; marker-augmented text (z184 rule) because the "
        "synthetic corpus is punctuation-free. One row-local "
        "projection + one map-side-combined agg"
    ),
)
def z199(spark, sf_dir):
    from ..operators.text import tokenizer_fertility

    docs = load(spark, "documents", sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" #"), F.col("doc_id").cast("string")
        ).alias("text"),
        "lang",
    )
    return tokenizer_fertility(docs, group_col="lang")
