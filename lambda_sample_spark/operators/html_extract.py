"""HTML / boilerplate text extraction (X56) — the front stage of a
real pretraining pipeline: raw crawl markup precedes every curation
operator in this repo, and the extraction itself is relational
(jusText/trafilatura's block model): split the page into block-level
elements, score each block with link-density / stopword / length
features in ONE projection, threshold-classify, and reassemble the
kept blocks in document order.

Reference tie-in: the dashboards' regex field extraction
(reference Dashboard.scala:96-102) is the same
extract-structure-from-markup class; this operator is its corpus-scale
form.

Rules (jusText-lite, integer arithmetic only — no float seam):
  - candidate blocks are ``<p>`` elements (nav/h1/footer are
    boilerplate by tag);
  - length: at least ``MIN_WORDS`` words;
  - link density: anchor-text chars at most 1/``LINK_DENSITY_DEN`` of
    the block's text chars (link farms drop);
  - stopword floor: at least 1 stopword per ``STOP_DECILE`` words
    (gibberish / keyword-stuffing drops).

Plan shape (the 100 TB story): synthesis + feature scoring are pure
projections over the corpus scan (explode fans out blocks, never
shuffles payloads); the only exchange is the final per-doc
reassembly groupBy(doc_id). The contract row replays the ENTIRE
chain — synthetic page assembly, block split, tag/feature extraction,
the keep rules, ordered reassembly — cell-exactly in DuckDB
(`q_html_extract`); planted-fixture tests pin the rules on real
boilerplate shapes (nav bars, link farms, short blocks, footers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import documents, fan_out

# block model: the block-level tags the splitter understands; pages
# synthesized below only emit these (a real crawl feeds html_blocks
# the same way after an upstream tag normalization)
SPLIT_RE = "</p>|</nav>|</h1>|</footer>"
OPEN_TAG_RE = "^<(p|nav|h1|footer)[^>]*>"
TAG_STRIP_RE = "<[^>]*>"
LINK_TEXT_RE = '<a [^>]*>([^<]*)</a>'

STOPWORDS = ("a", "the")  # the corpus vocabulary's function words
MIN_WORDS = 5  # length floor per block
LINK_DENSITY_DEN = 3  # keep iff LINK_DENSITY_DEN*link_chars <= text_chars
STOP_DECILE = 10  # keep iff STOP_DECILE*n_stop >= n_words

NAV_HTML = (
    '<nav><a href="/">Home</a> <a href="/c">Catalog</a>'
    ' <a href="/s">Support</a></nav>'
)
FOOTER_HTML = "<footer>(c) example.com all rights reserved</footer>"


def synthesize_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic crawl-page corpus for the contract row: each
    document becomes a page with a title, a nav bar, three content
    paragraphs (equal substring thirds of the doc text), a link-farm
    paragraph built from the doc's own words, and a footer — every
    boilerplate class the rules must separate, reconstructible
    arithmetically in DuckDB (the afp/phash keystream idiom, with
    substrings instead of md5)."""
    docs = documents(spark, sf_dir).select("doc_id", "text")
    # integer third: both engines floor positive integer division
    third = "CAST((length(text) + 2) DIV 3 AS INT)"
    return docs.select(
        "doc_id",
        F.concat(
            F.lit("<h1>Doc "),
            F.col("doc_id").cast("string"),
            F.lit("</h1>"),
            F.lit(NAV_HTML),
            F.lit("<p>"),
            F.expr(f"substring(text, 1, {third})"),
            F.lit("</p><p>"),
            F.expr(f"substring(text, 1 + {third}, {third})"),
            F.lit("</p><p>"),
            F.expr(f"substring(text, 1 + 2 * {third}, {third})"),
            F.lit("</p>"),
            F.lit('<p>Read <a href="/r">'),
            F.expr("substring(text, 1, 24)"),
            F.lit('</a> and <a href="/m">'),
            F.expr("substring(text, 25, 24)"),
            F.lit("</a> now</p>"),
            F.lit(FOOTER_HTML),
        ).alias("html"),
    )


def html_blocks(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Split pages into scored blocks: (doc_id, i, tag, text, n_words,
    text_chars, link_chars, n_stop, keep). One projection + posexplode
    — no shuffle; payload-free columns flow downstream."""
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    exploded = pages.select(
        "doc_id",
        F.posexplode(F.split(F.col(html_col), SPLIT_RE)).alias("i", "block"),
    )
    text = F.trim(
        F.regexp_replace(
            F.regexp_replace("block", TAG_STRIP_RE, " "), " +", " "
        )
    )
    feat = exploded.select(
        "doc_id",
        "i",
        F.regexp_extract("block", OPEN_TAG_RE, 1).alias("tag"),
        text.alias("text"),
        F.length(
            F.array_join(
                F.regexp_extract_all("block", F.lit(LINK_TEXT_RE), 1), ""
            )
        ).alias("link_chars"),
    ).where(F.col("tag") != "")
    words = F.split("text", " ")
    n_words = F.when(F.col("text") == "", F.lit(0)).otherwise(F.size(words))
    n_stop = F.when(F.col("text") == "", F.lit(0)).otherwise(
        F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    )
    scored = feat.select(
        "doc_id",
        "i",
        "tag",
        "text",
        n_words.cast("bigint").alias("n_words"),
        F.length("text").cast("bigint").alias("text_chars"),
        F.col("link_chars").cast("bigint").alias("link_chars"),
        n_stop.cast("bigint").alias("n_stop"),
    )
    keep = (
        (F.col("tag") == "p")
        & (F.col("n_words") >= MIN_WORDS)
        & (LINK_DENSITY_DEN * F.col("link_chars") <= F.col("text_chars"))
        & (STOP_DECILE * F.col("n_stop") >= F.col("n_words"))
    )
    return scored.withColumn("keep", keep)


def extract_text(blocks: DataFrame) -> DataFrame:
    """Reassemble each document's kept blocks in order: (doc_id,
    n_blocks, n_kept, content). The single exchange of the operator."""
    kept_struct = F.when(
        F.col("keep"), F.struct(F.col("i").alias("i"), F.col("text").alias("t"))
    )
    return blocks.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_blocks"),
        F.sum(F.col("keep").cast("bigint")).alias("n_kept"),
        F.coalesce(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda x: x["t"],
                ),
                " ",
            ),
            F.lit(""),
        ).alias("content"),
    )


def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract (tail, round 11): per-doc extraction census — block
    count, kept count, and the reassembled main text, replayed
    cell-exactly by the DuckDB oracle over the same synthetic pages."""
    pages = fan_out(synthesize_html(spark, sf_dir))
    return extract_text(html_blocks(pages))


_STOP_IN = " OR ".join(f"x = '{w}'" for w in STOPWORDS)

ORACLE_SQL = f"""
WITH pages AS (
  SELECT doc_id,
    '<h1>Doc ' || doc_id::VARCHAR || '</h1>'
    || '{NAV_HTML.replace("'", "''")}'
    || '<p>' || substr(text, 1, (length(text) + 2) // 3)
    || '</p><p>' || substr(text, 1 + (length(text) + 2) // 3,
                           (length(text) + 2) // 3)
    || '</p><p>' || substr(text, 1 + 2 * ((length(text) + 2) // 3),
                           (length(text) + 2) // 3)
    || '</p>'
    || '<p>Read <a href="/r">' || substr(text, 1, 24)
    || '</a> and <a href="/m">' || substr(text, 25, 24)
    || '</a> now</p>'
    || '{FOOTER_HTML.replace("'", "''")}' AS html
  FROM documents
), arrs AS (
  SELECT doc_id,
         regexp_split_to_array(html, '{SPLIT_RE}') AS arr
  FROM pages
), rawblocks AS (
  SELECT doc_id, ii.i, arr[ii.i + 1] AS block
  FROM arrs, LATERAL (SELECT unnest(range(0, len(arr))) AS i) ii
), feat AS (
  SELECT doc_id, i,
    COALESCE(regexp_extract(block, '{OPEN_TAG_RE}', 1), '') AS tag,
    trim(regexp_replace(regexp_replace(block, '{TAG_STRIP_RE}', ' ', 'g'),
                        ' +', ' ', 'g')) AS text,
    COALESCE(length(array_to_string(
      regexp_extract_all(block, '{LINK_TEXT_RE}', 1), '')), 0) AS link_chars
  FROM rawblocks
), scored AS (
  SELECT doc_id, i, tag, text,
    CASE WHEN text = '' THEN 0
         ELSE len(string_split(text, ' ')) END AS n_words,
    length(text) AS text_chars,
    link_chars,
    CASE WHEN text = '' THEN 0
         ELSE len(list_filter(string_split(text, ' '),
                              x -> {_STOP_IN})) END AS n_stop
  FROM feat WHERE tag <> ''
), flagged AS (
  SELECT *,
    (tag = 'p' AND n_words >= {MIN_WORDS}
     AND {LINK_DENSITY_DEN} * link_chars <= text_chars
     AND {STOP_DECILE} * n_stop >= n_words) AS keep
  FROM scored
)
SELECT doc_id,
       count(*)::BIGINT AS n_blocks,
       count(*) FILTER (WHERE keep)::BIGINT AS n_kept,
       COALESCE(string_agg(text, ' ' ORDER BY i) FILTER (WHERE keep),
                '') AS content
FROM flagged GROUP BY doc_id
"""

QUERIES: dict = {}
QUERIES_TAIL = {"q_html_extract": q_html_extract}
ORACLE = {"q_html_extract": ORACLE_SQL}
