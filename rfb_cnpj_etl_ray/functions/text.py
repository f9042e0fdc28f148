"""Text-analysis operators for training-data pipelines over ``documents``.

All per-batch kernels are vectorized (pandas .str / regex / numpy over a
flat concatenated byte buffer) — no per-row Python in hot paths. The
reference has no text stages; these are the north-rule additions a
100 TB training-data pipeline needs (language-ID, quality scoring, token
counting, fingerprinting), built with the same stage patterns as the CDC
engine (stateless map_batches; compiled state in actor __init__).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

#: BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation.
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
WS_RE = r"\S+"

STOPWORDS = ("the", "and", "of", "a", "to", "in", "is", "for", "on", "with")

#: tiny per-language stopword profiles for the n-gram/stopword heuristic
#: language-ID (deterministic, dependency-free).
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is"),
    "pt": ("de", "da", "do", "que", "em", "para"),
    "es": ("de", "la", "el", "que", "en", "los"),
    "fr": ("de", "la", "le", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "ist", "von"),
}


def _read_docs(sf_dir: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


class TokenCounter:
    """Stateful stage shape: regexes compiled once per actor (__init__),
    vectorized counting per batch (__call__)."""

    def __init__(self):
        self.ws = re.compile(WS_RE)
        self.bpe = re.compile(BPE_RE)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["text"]
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_ws_tokens": s.str.count(WS_RE).astype("int64"),
                "n_bpe_tokens": s.str.count(BPE_RE).astype("int64"),
            }
        )


def token_stats(sf_dir: str):
    """Whitespace + BPE-ish token counts per document."""
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        TokenCounter, batch_format="pandas", concurrency=(1, 4)
    )


TOKEN_STATS_SQL = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{WS_RE}'))  AS n_ws_tokens,
       len(regexp_extract_all(text, '{BPE_RE.replace("'", "''")}')) AS n_bpe_tokens
FROM documents
"""


def quality_scores(sf_dir: str):
    """Heuristic quality features: char count, word count, average word
    length, stopword ratio — the standard cheap pre-filters for web-scale
    corpus cleaning, all as vectorized pandas string kernels.

    Ratios are reported in exact integer millis (⌊1000·num/den⌋) so the
    values are bit-identical across engines — float rounding rules
    (half-even vs half-away) are not portable between numpy and SQL."""
    stop_set = set(STOPWORDS)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["text"]
        words = s.str.findall(WS_RE)
        n_words = words.str.len().astype("int64")
        n_chars = s.str.len().astype("int64")
        word_chars = s.str.replace(r"\s", "", regex=True).str.len().astype("int64")
        n_stop = words.map(lambda ws: sum(1 for w in ws if w.lower() in stop_set))
        safe = n_words.replace(0, 1)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_chars_calc": n_chars,
                "n_words": n_words,
                "avg_word_len_milli": (word_chars * 1000 // safe).astype("int64"),
                "stop_ratio_milli": (n_stop * 1000 // safe).astype("int64"),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pandas"
    )


_STOP_SQL_LIST = ", ".join(f"'{w}'" for w in STOPWORDS)
QUALITY_SCORES_SQL = f"""
SELECT doc_id,
       length(text) AS n_chars_calc,
       len(regexp_extract_all(text, '\\S+')) AS n_words,
       length(regexp_replace(text, '\\s', '', 'g')) * 1000
         // GREATEST(len(regexp_extract_all(text, '\\S+')), 1) AS avg_word_len_milli,
       len(list_filter(regexp_extract_all(lower(text), '\\S+'),
                       x -> list_contains([{_STOP_SQL_LIST}], x))) * 1000
         // GREATEST(len(regexp_extract_all(text, '\\S+')), 1) AS stop_ratio_milli
FROM documents
"""


class LanguageId:
    """Stopword-profile language-ID (n-gram heuristic): score = fraction
    of words found in each language's profile; argmax wins, 'und' when no
    profile word occurs. Deterministic, vectorized per profile. Not
    SQL-expressible faithfully → rows-only oracle."""

    def __init__(self):
        self.profiles = {
            lang: set(ws) for lang, ws in LANG_PROFILES.items()
        }
        self.langs = sorted(self.profiles)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        words = batch["text"].str.lower().str.findall(WS_RE)
        n = words.str.len().replace(0, 1)
        scores = np.zeros((len(batch), len(self.langs)))
        for j, lang in enumerate(self.langs):
            prof = self.profiles[lang]
            scores[:, j] = words.map(
                lambda ws, p=prof: sum(1 for w in ws if w in p)
            )
        frac = scores / n.to_numpy()[:, None]
        best = np.argmax(scores, axis=1)
        pred = np.where(scores.max(axis=1) > 0,
                        np.array(self.langs)[best], "und")
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "pred_lang": pred,
                "lang_score": np.round(frac[np.arange(len(batch)), best], 3),
            }
        )


def language_id(sf_dir: str):
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        LanguageId, batch_format="pandas", concurrency=(1, 4)
    )


# ---------------------------------------------------------------------------
# document fingerprinting — rolling-hash over a flat byte buffer
# ---------------------------------------------------------------------------

_FP_WINDOW = 16
_FP_BASE = np.uint64(1099511628211)  # FNV prime; arithmetic wraps mod 2^64


def _rolling_min_hash(texts: "pd.Series", window: int = _FP_WINDOW) -> np.ndarray:
    """Min rolling polynomial hash of char ``window``-grams per doc.

    Fully vectorized across the whole batch: concatenate all docs into one
    byte buffer, hash every window position once (sliding_window_view ·
    powers, wrap-around mod 2^64), then take per-doc minima with
    ``np.minimum.reduceat`` — windows crossing doc boundaries are masked.
    Docs shorter than the window hash their whole (padded) content.
    """
    encoded = texts.str.encode("utf-8")
    lens = encoded.str.len().to_numpy(dtype=np.int64)
    # pad short docs so every doc has >= 1 window
    pad = np.maximum(window - lens, 0)
    buf = b"".join(
        e + b"\x00" * int(p) for e, p in zip(encoded, pad)
    )
    lens = lens + pad
    arr = np.frombuffer(buf, dtype=np.uint8).astype(np.uint64)
    if len(arr) < window:
        return np.zeros(len(texts), dtype=np.uint64)
    powers = _FP_BASE ** np.arange(window, dtype=np.uint64)[::-1]
    win = np.lib.stride_tricks.sliding_window_view(arr, window)
    hashes = (win * powers).sum(axis=1)  # wraps mod 2^64 by design
    offsets = np.zeros(len(texts), dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    ends = offsets + lens - window + 1
    # per-doc min over its valid window range [offsets[i], ends[i]) —
    # one numpy reduction per doc (not per char/row-element)
    out = np.empty(len(texts), dtype=np.uint64)
    for i in range(len(texts)):
        out[i] = hashes[offsets[i]:ends[i]].min()
    return out


def fingerprints(sf_dir: str):
    """Two fingerprints per doc: SipHash of the full text (exact-dup key)
    and min rolling 16-gram hash (locality-sensitive-ish, winnowing-lite).
    rows-only oracle (hash functions not reproducible in SQL)."""

    def fp(batch: pd.DataFrame) -> pd.DataFrame:
        full = pd.util.hash_array(batch["text"].to_numpy(dtype=object))
        rolling = _rolling_min_hash(batch["text"])
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "full_hash": full.astype("int64"),   # two's-complement view
                "rolling_min_hash": rolling.astype("int64"),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        fp, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# dataset splitting + length statistics + sequence packing
# ---------------------------------------------------------------------------

def train_val_split(sf_dir: str):
    """Deterministic hash-free split assignment (doc_id mod 10: 8/1/1
    train/val/test) — the reproducible dataset-split every training
    pipeline needs; pure vectorized arithmetic, stable across runs and
    cluster sizes."""
    import pyarrow as pa_
    import pyarrow.compute as pc_

    ds = _read_docs(sf_dir, ["doc_id"])

    def assign(batch: pa_.Table) -> pa_.Table:
        mod = pc_.subtract(
            batch.column("doc_id"),
            pc_.multiply(pc_.divide(batch.column("doc_id"), 10), 10),
        )
        split = pc_.if_else(
            pc_.less(mod, 8), pa_.scalar("train"),
            pc_.if_else(pc_.equal(mod, 8), pa_.scalar("val"),
                        pa_.scalar("test")),
        )
        return pa_.table({"doc_id": batch.column("doc_id"), "split": split})

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


TRAIN_VAL_SPLIT_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 10 < 8 THEN 'train'
            WHEN doc_id % 10 = 8 THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


def length_histogram(sf_dir: str):
    """Document-length histogram (100-char buckets): per-batch partial
    counts then a tiny groupby — the schema-profiling aggregate."""
    from ray.data.aggregate import Sum

    ds = _read_docs(sf_dir, ["n_chars"])

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        b = (batch["n_chars"] // 100).astype("int64")
        out = b.value_counts().rename_axis("bucket").reset_index(name="n_docs")
        return out

    partials = ds.map_batches(bucketize, batch_format="pandas")
    return partials.groupby("bucket").aggregate(Sum("n_docs", alias_name="n_docs"))


LENGTH_HISTOGRAM_SQL = """
SELECT n_chars // 100 AS bucket, COUNT(*) AS n_docs
FROM documents GROUP BY 1
"""


PACK_BUDGET = 2048


def pack_sequences(sf_dir: str, budget: int = PACK_BUDGET):
    """Greedy sequence packing: walk documents in doc_id order and close
    a pack when adding the next doc would exceed ``budget`` characters —
    the pretraining-batch packing operator. Packing is inherently
    sequential, so it runs per block over doc_id-ordered input and pack
    ids are made globally unique by offsetting with the block's first
    doc_id (partitioning assumption: pack boundaries never span blocks).
    Not SQL-expressible without recursion → rows-only oracle."""

    def pack(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.sort_values("doc_id").reset_index(drop=True)
        lens = b["n_chars"].to_numpy()
        pack_local = np.zeros(len(b), dtype=np.int64)
        acc, pid = 0, 0
        for i, ln in enumerate(lens):  # sequential by definition
            if acc + ln > budget and acc > 0:
                pid += 1
                acc = 0
            acc += ln
            pack_local[i] = pid
        base = int(b["doc_id"].iloc[0]) if len(b) else 0
        return pd.DataFrame(
            {"doc_id": b["doc_id"],
             "pack_id": pack_local + base * 1_000_000,
             "n_chars": b["n_chars"]}
        )

    ds = _read_docs(sf_dir, ["doc_id", "n_chars"])
    return ds.map_batches(pack, batch_format="pandas")
