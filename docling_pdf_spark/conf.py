"""Pipeline constants.

Analog of the reference's `config.py` (docling-pdf `config.py:11-30`),
minus the Redis/API surface which has no Spark counterpart by design
(SURVEY.md §7 "out of scope"). Values that mirror a reference constant
cite it; the rest are ours.
"""

# --- admission gates (reference: main.py:102-121, config.py:20-21) ---
MAX_PDF_BYTES = 50 * 1024 * 1024  # config.py:20 MAX_FILE_SIZE
PDF_MAGIC = b"%PDF"               # main.py:117 startswith check

# --- geometry defaults (reference: pdf_extractor.py:668-671) ---
A4_WIDTH = 595.0
A4_HEIGHT = 842.0

# --- pagination (reference: pdf_extractor.py:413-442, lines_per_page) ---
LINES_PER_PAGE = 50

# --- HTML boilerplate heuristics (north_star: DOM-node density strip) ---
# Boilerpipe-style thresholds (Kohlschütter et al., WSDM 2010 — public
# literature): keep a block iff it has enough text and is not link-dense.
MIN_BLOCK_TEXT = 25       # min stripped characters for a content block
MAX_LINK_DENSITY = 0.34   # anchor-chars / total-chars above this = boilerplate
DROP_TAGS = frozenset({"nav", "header", "footer", "aside", "script", "style"})
BLOCK_TAGS = frozenset(
    {"p", "article", "section", "h1", "h2", "h3", "h4", "h5", "h6",
     "li", "blockquote", "pre", "div", "td"}
)

# --- extraction ladder rungs (analog of pdf_extractor.py:694-739 backend
# ladder pypdfium2 -> dlparse_v1 -> dlparse_v2, and the PyMuPDF fallback
# pdf_extractor.py:473-576). Ordered best -> worst. ---
RUNG_NATIVE = "native"          # doc had no pdf payloads
RUNG_STRICT = "strict"          # full object-graph parse   (≈ docling)
RUNG_LENIENT = "lenient"        # regex text-op scan        (≈ backend retry)
RUNG_RAW = "raw_fallback"       # printable-string sieve    (≈ pymupdf fallback)
RUNG_ORDER = (RUNG_NATIVE, RUNG_STRICT, RUNG_LENIENT, RUNG_RAW)

# --- near-dup candidate generation (LSH / ngram / simhash buckets) ---
# Pair expansion inside a bucket is O(b²): a boilerplate shingle shared
# by 10^6 docs would emit 10^12 pairs from ONE bucket at corpus scale.
# Buckets larger than this cap are dropped from pair generation (they
# carry ~zero signal: a feature shared by >cap docs is boilerplate, not
# similarity). Standard practice in the MinHash/LSH dedup literature;
# dropped mass is observable via operators.dedup.bucket_cap_stats —
# never capped silently. sf0.01 observed maxima are 3 (ngram shingle),
# 3 (LSH band), 17 (simhash chunk), so the cap is provably inert on the
# oracle corpus (asserted in tests/test_operators.py).
MAX_LSH_BUCKET = 512

# --- Spark-side tuning (SURVEY.md §4.3) ---
SHUFFLE_PARTITIONS = 32
ARROW_MAX_RECORDS_PER_BATCH = 1024  # rows/batch cap; actual memory is
                                    # bounded by the byte-capped rechunk
                                    # inside the UDF (pipeline.py)
SALT_BUCKETS = 8                    # salts per cost bucket for skew taming
OVERSIZE_COST_BUCKET_BYTES = 1 << 16  # docs above this get per-doc salting
