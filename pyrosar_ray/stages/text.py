"""Text-analysis stages for the training-data pipeline surface.

These extend the reference's scalar-function repertoire (SURVEY.md §2.9)
to the document table a 100 TB training-data pipeline carries alongside
imagery: token counting, quality scoring, language ID and document
fingerprinting. All stages are stateless ``map_batches`` with vectorized
kernels; tokenization is bit-matched to the DuckDB oracle
(``string_split(text, ' ')`` ⇔ ``str.count(' ') + 1``, which agree even
on repeated spaces because DuckDB keeps empty split elements).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from . import table_from_pandas

#: stopword list shared verbatim with the SQL oracle
STOPWORDS = ("the", "a", "of", "and", "to", "in")

#: BPE-ish word/punctuation tokenizer, identical to the oracle's
#: regexp_extract_all pattern
TOKEN_RE = r"\w+|[^\w\s]"
_TOKEN_RE = re.compile(TOKEN_RE)


def token_stats(docs: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """Per-doc token counts: whitespace tokens and regex (BPE-ish) tokens."""

    def _stats(batch: pa.Table) -> pa.Table:
        s = batch[text_col].to_pandas().astype("string")
        n_ws = (s.str.count(" ") + 1).astype("int64")
        n_re = s.str.count(TOKEN_RE).astype("int64")
        return pa.table(
            {
                id_col: batch[id_col],
                "n_tokens": pa.array(n_ws.to_numpy()),
                "n_retokens": pa.array(n_re.to_numpy()),
            }
        )

    return docs.map_batches(_stats, batch_format="pyarrow")


def quality_scores(docs: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """Per-doc quality signals: token count, distinct tokens, stopword ratio.

    ``stop_ratio`` is one int/int double division on both engine and
    oracle sides, so values are bit-equal.
    """
    stopset = frozenset(STOPWORDS)

    def _scores(batch: pa.Table) -> pa.Table:
        s = batch[text_col].to_pandas().astype("string")
        tokens = s.str.split(" ")
        n_tokens = tokens.map(len).astype("int64")
        n_uniq = tokens.map(lambda t: len(set(t))).astype("int64")
        n_stop = tokens.map(lambda t: sum(1 for x in t if x in stopset)).astype("int64")
        ratio = n_stop.to_numpy() / n_tokens.to_numpy()
        return pa.table(
            {
                id_col: batch[id_col],
                "n_tokens": pa.array(n_tokens.to_numpy()),
                "n_uniq_tokens": pa.array(n_uniq.to_numpy()),
                "n_stopwords": pa.array(n_stop.to_numpy()),
                "stop_ratio": pa.array(ratio),
            }
        )

    return docs.map_batches(_scores, batch_format="pyarrow")


def gopher_filter(
    docs: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 30,
    max_words: int = 100_000,
    min_mean_len: int = 3,
    max_mean_len: int = 10,
    min_stop_distinct: int = 2,
    max_top_freq_pct: int = 10,
) -> Dataset:
    """Gopher-style document quality gate (Rae et al. 2021, §A1.1),
    restricted to the rules that are integer-exact on this corpus.

    A document survives when ALL hold:

    - word count in ``[min_words, max_words]``;
    - mean word length in ``[min_mean_len, max_mean_len]`` — tested as
      the cross-multiplied integer inequality ``min·n ≤ Σlen ≤ max·n``
      where ``Σlen = len(text) − (n_words − 1)`` (split on single
      spaces: total token length is text length minus separator count,
      exact on both engine and oracle);
    - at least ``min_stop_distinct`` DISTINCT stopwords from
      :data:`STOPWORDS` present (Gopher's "contains ≥2 stop words");
    - the most frequent token accounts for at most
      ``max_top_freq_pct``% of the words (the repetition rule), tested
      as ``max_freq · 100 ≤ n_words · pct``.

    Every signal is an integer, so the survivor set is bit-equal to the
    SQL twin. Stateless ``map_batches``; zero exchange — the filter is
    embarrassingly parallel at any corpus size.
    """
    stopset = frozenset(STOPWORDS)

    def _gate(batch: pa.Table) -> pa.Table:
        s = batch[text_col].to_pandas().astype("string")
        tokens = s.str.split(" ")
        n_words = tokens.map(len).to_numpy().astype(np.int64)
        sum_wlen = s.str.len().to_numpy().astype(np.int64) - n_words + 1
        n_stop = tokens.map(lambda t: len(stopset.intersection(t))).to_numpy().astype(np.int64)

        def _maxfreq(t: list) -> int:
            c: dict = {}
            for w in t:
                c[w] = c.get(w, 0) + 1
            return max(c.values())

        max_freq = tokens.map(_maxfreq).to_numpy().astype(np.int64)
        keep = (
            (n_words >= min_words)
            & (n_words <= max_words)
            & (min_mean_len * n_words <= sum_wlen)
            & (sum_wlen <= max_mean_len * n_words)
            & (n_stop >= min_stop_distinct)
            & (max_freq * 100 <= n_words * max_top_freq_pct)
        )
        return pa.table(
            {
                id_col: batch[id_col].to_numpy()[keep],
                "n_words": pa.array(n_words[keep]),
                "sum_wlen": pa.array(sum_wlen[keep]),
                "n_stop_distinct": pa.array(n_stop[keep]),
                "max_tok_freq": pa.array(max_freq[keep]),
            }
        )

    return docs.map_batches(_gate, batch_format="pyarrow")


# --------------------------------------------------------------- lang id


class LangID:
    """Char-trigram language classifier (actor-pool stage).

    Profiles are learned once per actor in ``__init__`` from a broadcast
    (lang → trigram-frequency vector) table and scored per batch with one
    sparse dot product per doc — the standard n-gram-heuristic lang-ID
    shape. Deterministic: hashing trigrams into a fixed 2^14 bucket space.
    """

    BUCKETS = 1 << 14

    @staticmethod
    def trigram_counts(texts: "pd.Series") -> np.ndarray:
        """(n_docs, BUCKETS) float32 L2-normalized trigram histograms.

        One batched scatter for the whole input: all docs' bytes are
        concatenated, trigram hashes computed in one vectorized pass,
        and window positions that straddle a document boundary are
        masked out — no per-document Python loop.
        """
        out = _trigram_counts_int(texts).astype(np.float32)
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return out / norms

    @classmethod
    def fit_profiles(cls, texts, langs) -> dict[str, np.ndarray]:
        """lang → mean normalized trigram vector."""
        hist = cls.trigram_counts(pd.Series(list(texts)))
        langs = np.asarray(langs, dtype=object)
        profiles = {}
        for lang in np.unique(langs):
            v = hist[langs == lang].mean(axis=0)
            n = np.linalg.norm(v)
            profiles[str(lang)] = v / (n if n else 1.0)
        return profiles

    def __init__(self, profiles_ref):
        import ray

        self.profiles = ray.get(profiles_ref)
        self.langs = sorted(self.profiles)
        self.matrix = np.stack([self.profiles[lang] for lang in self.langs])

    def __call__(self, batch: pa.Table) -> pa.Table:
        hist = self.trigram_counts(batch["text"].to_pandas())
        scores = hist @ self.matrix.T
        pred = np.asarray(self.langs, dtype=object)[scores.argmax(axis=1)]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang_pred": pa.array(pred, type=pa.string()),
            }
        )


def lang_id(docs: Dataset, profiles: dict[str, np.ndarray], concurrency=(1, 2)) -> Dataset:
    """Predict a language per doc against broadcast trigram profiles."""
    import ray

    ref = ray.put(profiles)
    return docs.map_batches(
        LangID, batch_format="pyarrow", concurrency=concurrency, fn_constructor_args=(ref,)
    )


def _trigram_counts_int(texts: "pd.Series") -> np.ndarray:
    """(n_docs, BUCKETS) RAW int64 trigram-bucket counts — the integer
    core of :meth:`LangID.trigram_counts` (same hash, no normalize)."""
    n = len(texts)
    out = np.zeros((n, LangID.BUCKETS), dtype=np.int64)
    encoded = [t.encode("utf-8", "ignore") for t in texts]
    lens = np.array([len(b) for b in encoded], dtype=np.int64)
    total = int(lens.sum())
    if total >= 3:
        a = np.frombuffer(b"".join(encoded), dtype=np.uint8).astype(np.int64)
        tri = (a[:-2] * 1_000_003 + a[1:-1] * 10_007 + a[2:]) % LangID.BUCKETS
        ends = np.cumsum(lens)
        pos = np.arange(total - 2)
        doc = np.searchsorted(ends, pos, side="right")
        valid = pos + 3 <= ends[doc]
        np.add.at(out, (doc[valid], tri[valid]), 1)
    return out


def lang_id_int(
    docs: Dataset,
    text_col: str = "text",
    lang_col: str = "lang",
    id_col: str = "doc_id",
    norm_scale: int = 1_000_000,
) -> Dataset:
    """Integer-exact trigram language ID — the hash-twinnable lang-ID.

    The float classifier (:class:`LangID`) is rows-only (float32 dots);
    this variant keeps the whole chain in integers so a DuckDB twin
    reproduces it bit-for-bit. Profiles are corpus-trained: per-language
    trigram-bucket counts fold per batch and merge in ONE bounded
    groupby-Sum (≤ langs × 2¹⁴ rows at any corpus size), are quantized
    per bucket to ``q = (count · norm_scale) // lang_total`` (≤
    norm_scale — this pre-normalization also caps the scoring dot at
    doc_trigrams × norm_scale, int64-safe at any scale), broadcast once,
    and scoring is one row-local integer matmul per batch with
    argmax(score desc, lang asc). Byte-level trigrams == the twin's
    character arithmetic on ASCII corpora (this table's contract).
    """
    import ray
    from ray.data.aggregate import Sum

    def _profile_partial(batch: pa.Table) -> pa.Table:
        counts = _trigram_counts_int(batch[text_col].to_pandas())
        langs = np.asarray(batch[lang_col].to_pylist(), dtype=object)
        out_lang, out_b, out_c = [], [], []
        for lang in np.unique(langs):
            v = counts[langs == lang].sum(axis=0)
            nz = np.flatnonzero(v)
            out_lang.extend([str(lang)] * len(nz))
            out_b.append(nz)
            out_c.append(v[nz])
        return pa.table(
            {
                "lang": pa.array(out_lang, type=pa.string()),
                "b": pa.array(
                    np.concatenate(out_b) if out_b else np.array([], np.int64)
                ),
                "c": pa.array(
                    np.concatenate(out_c) if out_c else np.array([], np.int64)
                ),
            }
        )

    prof_rows = (
        docs.select_columns([text_col, lang_col])
        .map_batches(_profile_partial, batch_format="pyarrow")
        .groupby(["lang", "b"])
        .aggregate(Sum("c", alias_name="c"))
        .take_all()
    )
    langs = sorted({r["lang"] for r in prof_rows})
    lang_ix = {lang: i for i, lang in enumerate(langs)}
    prof = np.zeros((len(langs), LangID.BUCKETS), dtype=np.int64)
    for r in prof_rows:
        prof[lang_ix[r["lang"]], int(r["b"])] = int(r["c"])
    totals = prof.sum(axis=1)
    totals[totals == 0] = 1
    # per-bucket quantized weights (floor division; all operands >= 0,
    # so Python // == SQL // here)
    q = (prof * norm_scale) // totals[:, None]
    q_ref = ray.put((langs, q))

    def _classify(batch: pa.Table) -> pa.Table:
        lgs, qm = ray.get(q_ref)
        counts = _trigram_counts_int(batch[text_col].to_pandas())
        scores = counts @ qm.T  # (n, L) int64
        best = scores.argmax(axis=1)  # first max = smallest lang (sorted)
        return pa.table(
            {
                id_col: batch[id_col],
                "pred_lang": pa.array(
                    np.asarray(lgs, dtype=object)[best], type=pa.string()
                ),
                "score": pa.array(scores[np.arange(len(best)), best]),
            }
        )

    return docs.select_columns([id_col, text_col]).map_batches(
        _classify, batch_format="pyarrow"
    )


# ---------------------------------------------------------- fingerprints

_MOD = (1 << 61) - 1
_BASE = 1_000_003


def rolling_fingerprint(texts) -> np.ndarray:
    """Polynomial rolling hash of each text's bytes, mod 2^61-1 (int64).

    Vectorized across bytes per doc: split each byte array into 7-byte
    limbs (fits exactly in an int64), then Horner over the ~len/7 limbs
    with Python-int modular arithmetic (exact, overflow-free).
    """
    limb_base = pow(_BASE, 7, _MOD)
    weights = _BASE ** np.arange(6, -1, -1, dtype=object)
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        b = np.frombuffer(t.encode("utf-8", "ignore"), dtype=np.uint8)
        if len(b) == 0:
            out[i] = 0
            continue
        pad = (-len(b)) % 7
        padded = np.concatenate([np.zeros(pad, dtype=np.uint8), b])
        limbs = (padded.reshape(-1, 7).astype(object) * weights).sum(axis=1) % _MOD
        acc = 0
        for limb in limbs.tolist():
            acc = (acc * limb_base + int(limb)) % _MOD
        out[i] = acc
    return out


def fingerprints(docs: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """Per-doc rolling-hash fingerprint column."""

    def _fp(batch: pa.Table) -> pa.Table:
        fp = rolling_fingerprint(batch[text_col].to_pylist())
        return pa.table({id_col: batch[id_col], "fingerprint": pa.array(fp)})

    return docs.map_batches(_fp, batch_format="pyarrow")


# ----------------------------------------------- corpus-wide aggregates


def term_topk(docs: Dataset, k: int, text_col: str = "text") -> Dataset:
    """Corpus-wide top-``k`` most frequent whitespace tokens.

    The canonical pre-aggregated wide plan: each batch explodes its texts
    and emits per-batch ``(token, n)`` partials (one row per DISTINCT
    token per block, not per occurrence), the global
    ``groupby(token).Sum`` merges them, and the final distributed
    ``sort((n desc, token asc)).limit(k)`` runs over the vocabulary-sized
    table — never the corpus.  Tokenization matches DuckDB's
    ``str_split(text, ' ')`` (empty elements kept), and the (count desc,
    token asc) total order makes the cut deterministic under ties.
    """
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        s = batch[text_col].to_pandas().astype("string")
        counts = s.str.split(" ").explode().value_counts(sort=False)
        return pa.table(
            {
                "token": pa.array(counts.index.to_numpy(), type=pa.string()),
                "n": pa.array(counts.to_numpy().astype(np.int64)),
            }
        )

    totals = docs.map_batches(_partial, batch_format="pyarrow")
    merged = totals.groupby("token").aggregate(Sum("n", alias_name="n"))
    return merged.sort(["n", "token"], descending=[True, False]).limit(k)


def token_count_quantiles(
    docs: Dataset, qs: "list[float]", text_col: str = "text"
) -> pa.Table:
    """Exact quantiles of the per-doc whitespace-token count.

    Distributed exact quantiles over an integer-valued metric via a
    bounded histogram: each batch emits ``(n_tokens, count)`` partials, a
    small ``groupby.Sum`` merges them, and the driver inverts the
    cumulative histogram — justified driver combine because the key
    space is bounded by the longest document's token count (≤ a few
    thousand distinct values at any corpus size).  Quantile definition
    (shared verbatim with the SQL twin): the smallest value whose
    cumulative count reaches ``ceil(q·N)``.
    """
    import math

    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        s = batch[text_col].to_pandas().astype("string")
        n_tok = (s.str.count(" ") + 1).astype("int64")
        counts = n_tok.value_counts(sort=False)
        return pa.table(
            {
                "v": pa.array(counts.index.to_numpy().astype(np.int64)),
                "c": pa.array(counts.to_numpy().astype(np.int64)),
            }
        )

    hist = (
        docs.map_batches(_partial, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("c", alias_name="c"))
        .sort("v")
        .to_pandas()
    )
    if hist.empty:  # Ray's empty→pandas conversion also drops columns
        return pa.table(
            {"q": pa.array([], type=pa.float64()), "v": pa.array([], type=pa.int64())}
        )
    values = hist["v"].to_numpy()
    cum = hist["c"].to_numpy().cumsum()
    total = int(cum[-1])
    out_q, out_v = [], []
    for q in qs:
        rank = max(1, math.ceil(q * total))
        out_q.append(float(q))
        out_v.append(int(values[np.searchsorted(cum, rank)]))
    return pa.table(
        {"q": pa.array(out_q, type=pa.float64()), "v": pa.array(out_v, type=pa.int64())}
    )


def normalize_text(docs: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """Canonical text normalization before dedup/fingerprinting.

    lowercase → strip punctuation (``[^\\w\\s]``) → collapse whitespace
    runs → trim; emitted with the normalized length. Pure ``.str``
    kernels, stateless ``map_batches``. Regex classes are ASCII-equal
    between pandas and the DuckDB RE2 twin on this corpus; the shared
    step order is the contract.
    """

    def _norm(batch: pa.Table) -> pa.Table:
        s = batch[text_col].to_pandas().astype("string")
        out = (
            s.str.lower()
            .str.replace(r"[^\w\s]", "", regex=True)
            .str.replace(r"\s+", " ", regex=True)
            .str.strip()
        )
        return pa.table(
            {
                id_col: batch[id_col],
                "norm_text": pa.array(out.to_numpy(), type=pa.string()),
                "norm_chars": pa.array(out.str.len().to_numpy().astype(np.int64)),
            }
        )

    return docs.map_batches(_norm, batch_format="pyarrow")


def top_tf_df_terms(docs: Dataset, k: int = 3, text_col: str = "text",
                    id_col: str = "doc_id") -> Dataset:
    """Per-doc top-``k`` terms ranked by (tf desc, df asc, token asc).

    The classic TF-IDF retrieval shape kept integer-exact: rather than a
    float tf·log(N/df) score (not bit-reproducible across engines), the
    rank orders by raw term frequency with document frequency as the
    tie-break — the same ordering TF-IDF induces when tf dominates.

    Physical plan: document frequency comes from per-batch DISTINCT
    (doc, token) partials (a doc lives entirely in one batch) merged by
    a vocabulary-sized ``groupby.Sum``; the merged table is broadcast
    once via ``ray.put`` and each batch joins + ranks its own docs
    locally. Only vocabulary-sized data crosses the wire. (At corpora
    where the vocabulary itself outgrows a broadcast, the join flips to
    a hash-partition on token — same downstream ranking.)
    """
    import ray
    from ray.data.aggregate import Sum

    def _df_partial(batch: pa.Table) -> pa.Table:
        s = batch[text_col].to_pandas().astype("string")
        exploded = s.str.split(" ").explode()
        pairs = pd.DataFrame(
            {"doc": exploded.index, "token": exploded.to_numpy()}
        ).drop_duplicates()
        counts = pairs.groupby("token", sort=False).size()
        return pa.table(
            {
                "token": pa.array(counts.index.to_numpy(), type=pa.string()),
                "df": pa.array(counts.to_numpy().astype(np.int64)),
            }
        )

    df_table = (
        docs.map_batches(_df_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("df", alias_name="df"))
        .to_pandas()
    )
    if df_table.empty:  # Ray's empty→pandas conversion drops columns
        df_table = pd.DataFrame(
            {"token": pd.Series([], dtype="string"), "df": pd.Series([], dtype="int64")}
        )
    df_ref = ray.put(df_table.set_index("token")["df"])

    def _rank(batch: pa.Table) -> pa.Table:
        df_map = ray.get(df_ref)
        s = batch[text_col].to_pandas().astype("string")
        ids = batch[id_col].to_pandas()
        exploded = s.str.split(" ").explode()
        frame = pd.DataFrame(
            {id_col: ids.iloc[exploded.index].to_numpy(), "token": exploded.to_numpy()}
        )
        tf = frame.groupby([id_col, "token"], sort=False, as_index=False).size()
        tf = tf.rename(columns={"size": "tf"})
        tf["df"] = df_map.reindex(tf["token"]).to_numpy()
        tf = tf.sort_values(
            [id_col, "tf", "df", "token"], ascending=[True, False, True, True],
            kind="mergesort",
        )
        top = tf.groupby(id_col, sort=False).head(k).copy()
        top["rank"] = top.groupby(id_col, sort=False).cumcount() + 1
        return table_from_pandas(
            top.astype({"tf": "int64", "df": "int64", "rank": "int64"})
        )

    return docs.map_batches(_rank, batch_format="pyarrow")


def token_count_quantiles_by(
    docs: Dataset,
    qs: "list[float]",
    key_col: str = "source",
    text_col: str = "text",
) -> pa.Table:
    """Per-key exact token-count quantiles (the keyed variant of
    :func:`token_count_quantiles`).

    Same bounded-histogram plan with the key joined in: partials are
    ``(key, n_tokens) → count``, merged by a small groupby, inverted
    per key on the driver (bounded: keys × distinct counts). Quantile
    definition shared with the SQL twin: smallest value whose
    cumulative count reaches ``ceil(q·N_key)``.
    """
    import math

    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        s = batch[text_col].to_pandas().astype("string")
        df = pd.DataFrame(
            {
                key_col: batch[key_col].to_pandas().to_numpy(),
                "v": (s.str.count(" ") + 1).astype("int64").to_numpy(),
            }
        )
        part = df.groupby([key_col, "v"], sort=False, as_index=False).size()
        part = part.rename(columns={"size": "c"})
        return table_from_pandas(part)

    hist = (
        docs.map_batches(_partial, batch_format="pyarrow")
        .groupby([key_col, "v"])
        .aggregate(Sum("c", alias_name="c"))
        .sort([key_col, "v"])
        .to_pandas()
    )
    out_k, out_q, out_v = [], [], []
    for key, grp in hist.groupby(key_col, sort=True):
        values = grp["v"].to_numpy()
        cum = grp["c"].to_numpy().cumsum()
        total = int(cum[-1])
        for q in qs:
            rank = max(1, math.ceil(q * total))
            out_k.append(key)
            out_q.append(float(q))
            out_v.append(int(values[np.searchsorted(cum, rank)]))
    return pa.table(
        {
            key_col: pa.array(out_k, type=pa.string()),
            "q": pa.array(out_q, type=pa.float64()),
            "v": pa.array(out_v, type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# PII redaction / repetition signals / benchmark decontamination
# ---------------------------------------------------------------------------

#: redaction patterns shared verbatim with the SQL twin (RE2-compatible).
#: Applied strictly in this order — an IP must be scrubbed before the
#: phone rule could ever see its digits, and both twins agree on order.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\b555-\d{4}\b", "[PHONE]"),
)

_PII_COMPILED = [(name, re.compile(pat), repl) for name, pat, repl in PII_PATTERNS]


def redact_pii(docs: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """Scrub emails / IPv4s / phone numbers, emitting per-kind counts.

    The large-scale PII pass every training-data pipeline runs before
    tokenization. Stateless, fully vectorized (pandas str.count /
    str.replace run the compiled RE2-compatible patterns columnar).
    """

    def _redact(batch: pa.Table) -> pa.Table:
        s = batch[text_col].to_pandas().astype("string")
        counts = {}
        for name, rx, repl in _PII_COMPILED:
            counts[name] = s.str.count(rx.pattern).fillna(0).astype("int64")
            s = s.str.replace(rx, repl, regex=True)
        return pa.table(
            {
                id_col: batch[id_col],
                "clean_text": pa.array(s.to_numpy(dtype=object), type=pa.string()),
                "n_emails": pa.array(counts["email"].to_numpy()),
                "n_ips": pa.array(counts["ip"].to_numpy()),
                "n_phones": pa.array(counts["phone"].to_numpy()),
            }
        )

    return docs.map_batches(_redact, batch_format="pyarrow")


def repetition_signals(
    docs: Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> Dataset:
    """Gopher-style repetition quality signals per document.

    ``dup_word_frac`` = 1 − distinct/total whitespace tokens;
    ``top_bigram_frac`` = occurrences of the most frequent adjacent
    bigram ÷ total bigrams (ties don't matter — only the max count is
    used). Batch-columnar via one explode + two groupbys; no per-doc
    Python loop.
    """

    def _signals(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pandas()
        s = batch[text_col].to_pandas().astype("string")
        toks = s.str.split(" ")
        df = pd.DataFrame({"i": np.arange(len(s)), "tok": toks}).explode("tok")
        grp = df.groupby("i")["tok"]
        total = grp.size()
        distinct = grp.nunique()
        dup_frac = (1.0 - distinct.to_numpy() / total.to_numpy()).astype(np.float64)

        # positional assignment: the exploded frame's index is non-unique,
        # so index-aligned Series assignment would mis-broadcast
        df["nxt"] = grp.shift(-1).to_numpy()
        big = df.dropna(subset=["nxt"])
        big_counts = big.groupby(["i", "tok", "nxt"], sort=False).size()
        top = big_counts.groupby(level=0).max().reindex(np.arange(len(s)))
        n_big = (total - 1).clip(lower=0)
        with np.errstate(invalid="ignore", divide="ignore"):
            top_frac = np.where(
                n_big.to_numpy() > 0,
                top.fillna(0).to_numpy() / n_big.to_numpy(),
                0.0,
            )
        return pa.table(
            {
                id_col: batch[id_col],
                "n_tokens": pa.array(total.to_numpy().astype(np.int64)),
                "dup_word_frac": pa.array(dup_frac),
                "top_bigram_frac": pa.array(top_frac.astype(np.float64)),
            }
        )

    return docs.map_batches(_signals, batch_format="pyarrow")


def benchmark_ngrams(sf_dir: str, every: int = 97, n_tokens: int = 8) -> list[str]:
    """The small decontamination side: first ``n_tokens`` whitespace
    tokens of every ``every``-th document. Small by construction
    (~N/97 strings), so materializing it driver-side IS the plan —
    it then rides the object store once via ray.put, never shuffled.

    Cost-based read (the engine's standard split): under a provable
    256 MB input bound the two columns are read driver-side with
    pyarrow directly — launching a distributed pipeline to produce 50
    strings costs more than the scan; above the bound the scan runs as
    a Ray pipeline (at real scale the benchmark set is an external
    small table anyway)."""
    import pyarrow.parquet as _pq

    from ..pipelines.tables import read_parquet_clean

    path = f"{sf_dir}/documents.parquet"
    meta = _pq.ParquetFile(path).metadata
    small_enough = (
        sum(
            meta.row_group(g).total_byte_size for g in range(meta.num_row_groups)
        )
        < 256 * 1024 * 1024
    )
    if small_enough:
        tbl = _pq.read_table(path, columns=["doc_id", "text"])
        df = tbl.to_pandas()
        df = df[df["doc_id"] % every == 0].sort_values("doc_id")
        ng = df["text"].astype("string").str.split(" ").str[:n_tokens].str.join(" ")
        return ng.tolist()

    docs = read_parquet_clean(path, columns=["doc_id", "text"])

    def _first(batch: pa.Table) -> pa.Table:
        mask = batch["doc_id"].to_numpy() % every == 0
        batch = batch.filter(pa.array(mask))
        s = batch["text"].to_pandas().astype("string")
        ng = s.str.split(" ").str[:n_tokens].str.join(" ")
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "ng": pa.array(ng.to_numpy(dtype=object), type=pa.string()),
            }
        )

    small = docs.map_batches(_first, batch_format="pyarrow").to_pandas()
    return small.sort_values("doc_id")["ng"].tolist()


def decontaminate(
    docs: Dataset,
    ngrams: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """Flag documents containing any benchmark n-gram (substring match).

    Scale shape: the benchmark set is tiny (≤ thousands of strings) and
    rides the object store once (``ray.put`` below); every batch scans
    it columnar with one vectorized ``str.contains`` pass per pattern.
    At corpus scale swap the inner loop for an Aho-Corasick automaton
    built once per actor — the plan (broadcast small side, stream the
    corpus, zero shuffle) is unchanged.
    """
    import ray

    ref = ray.put(ngrams)

    def _flag(batch: pa.Table) -> pa.Table:
        pats = ray.get(ref)
        s = batch[text_col].to_pandas().astype("string")
        hits = np.zeros(len(s), dtype=np.int64)
        for p in pats:
            hits += s.str.contains(p, regex=False).fillna(False).to_numpy()
        return pa.table(
            {
                id_col: batch[id_col],
                "contaminated": pa.array(hits > 0),
                "n_hits": pa.array(hits),
            }
        )

    return docs.map_batches(_flag, batch_format="pyarrow")


def adaptive_token_filter(
    docs: Dataset,
    q: float = 0.5,
    key_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Per-key adaptive quality cutoff: keep documents whose token count
    reaches their OWN key's exact q-quantile (the corpus-curation move
    that a single global threshold gets wrong when sources differ in
    register). Two passes: the bounded-histogram keyed quantile
    (:func:`token_count_quantiles_by`, keys x distinct-counts exchange),
    then a broadcast cutoff map filters the stream — no shuffle of the
    documents themselves.
    """
    cuts = token_count_quantiles_by(docs, [q], key_col=key_col, text_col=text_col)
    cutoff = {k: int(v) for k, v in zip(cuts[key_col].to_pylist(), cuts["v"].to_pylist())}

    def _filter(batch: pa.Table) -> pa.Table:
        s = batch[text_col].to_pandas().astype("string")
        n = (s.str.count(" ") + 1).astype("int64").to_numpy()
        keys = batch[key_col].to_pylist()
        lim = np.array([cutoff.get(k, 0) for k in keys], dtype=np.int64)
        keep = n >= lim
        out = pa.table(
            {
                id_col: batch[id_col],
                key_col: batch[key_col],
                "n_tokens": pa.array(n),
            }
        )
        return out.filter(pa.array(keep))

    return docs.map_batches(_filter, batch_format="pyarrow")


def chunk_documents(
    docs: Dataset,
    chunk_tokens: int = 32,
    stride: int = 24,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """Split each document into fixed-token-window chunks with overlap —
    the standard LLM-pretraining chunking op (window ``chunk_tokens``,
    hop ``stride``; stride < chunk_tokens overlaps adjacent chunks).

    Chunk starts are 0, stride, 2*stride, ... while start < n_tokens,
    except that a final partial window starting past ``n - chunk_tokens``
    is emitted only when it adds tokens not covered by the previous
    chunk (i.e. starts are capped at max(0, n - chunk_tokens) and
    deduplicated) — every token lands in >= 1 chunk and no chunk is a
    strict suffix duplicate. Row-local (one explode, no shuffle); output
    rows ``(doc_id, chunk_id, n_tokens, chunk_text)``.
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")

    def _chunks(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        texts = batch[text_col].to_pylist()
        out_id, out_ch, out_n, out_tx = [], [], [], []
        for i, t in enumerate(texts):
            toks = (t or "").split(" ")
            n = len(toks)
            last = max(0, n - chunk_tokens)
            starts = list(range(0, last + 1, stride))
            if starts[-1] != last:
                starts.append(last)
            for ci, s in enumerate(starts):
                piece = toks[s : s + chunk_tokens]
                out_id.append(ids[i])
                out_ch.append(ci)
                out_n.append(len(piece))
                out_tx.append(" ".join(piece))
        return pa.table(
            {
                id_col: pa.array(out_id, type=pa.int64()),
                "chunk_id": pa.array(out_ch, type=pa.int64()),
                "n_tokens": pa.array(out_n, type=pa.int64()),
                "chunk_text": pa.array(out_tx, type=pa.string()),
            }
        )

    return docs.map_batches(_chunks, batch_format="pyarrow")


def inverted_index(
    docs: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
) -> Dataset:
    """Posting lists: every token → sorted doc ids containing it + df.

    Search-index construction over the corpus: each batch explodes its
    texts to DISTINCT ``(token, doc_id)`` pairs (within-doc duplicates
    collapse before the exchange, the same partial pruning as
    :func:`term_topk`), one groupby co-partitions each term's postings,
    and the per-term kernel emits ``(token, df, postings)`` with the
    posting list as a comma-joined ascending id string — a hashable,
    order-defined surface (list columns defeat the value-hash gate).

    Scale note: a term's postings land on ONE reducer — df for
    stop-like terms is corpus-sized, so real deployments set ``min_df``
    > 1 only prunes the tail; cap the HEAD by filtering known stopwords
    upstream or sharding hot terms by ``doc_id`` range into
    ``token#shard`` keys (the salted-key pattern in
    stages/tiling.py:salted_group_apply).
    """
    from . import table_from_pandas

    def _pairs(batch: pa.Table) -> pa.Table:
        s = batch[text_col].to_pandas().astype("string")
        ids = batch[id_col].to_numpy()
        ex = s.str.split(" ").explode()
        df = pd.DataFrame(
            {"token": ex.to_numpy(), id_col: ids[ex.index.to_numpy()]}
        ).drop_duplicates()
        return table_from_pandas(df)

    def _postings(tab: pa.Table) -> pa.Table:
        df = tab.to_pandas()
        out = (
            df.sort_values([ "token", id_col])
            .groupby("token", sort=False)[id_col]
            .agg(
                df_count="size",
                postings=lambda s: ",".join(map(str, s.to_numpy())),
            )
            .reset_index()
        )
        out = out[out["df_count"] >= min_df]
        out["df_count"] = out["df_count"].astype(np.int64)
        return table_from_pandas(out)

    return (
        docs.map_batches(_pairs, batch_format="pyarrow")
        .groupby("token")
        .map_groups(_postings, batch_format="pyarrow")
    )


def bm25_scores(
    docs: Dataset,
    query_terms: "tuple[str, ...]",
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """BM25 relevance of every document against one broadcast query.

    The IR scoring primitive over the corpus: two TINY aggregates (per-
    term document frequencies + corpus token total, both vocabulary/
    scalar-sized partial Sums — never a corpus shuffle) feed a row-local
    scoring pass. idf values are computed once driver-side with
    ``math.log`` (libm, matching the SQL twin's ``ln`` bit-for-bit;
    numpy's SIMD log can drift a ulp); the per-term contribution and the
    fixed ascending-term-order summation mirror the twin's expression
    tree exactly, so float64 scores hash-match.

    Output: one row per document — (id, score).
    """
    import math

    from ray.data.aggregate import Sum

    terms = sorted(query_terms)
    if not terms:
        raise ValueError("query_terms must be non-empty")

    def _tf(batch: pa.Table) -> pa.Table:
        s = batch[text_col].to_pandas().astype("string")
        toks = s.str.split(" ")
        cols = {
            id_col: batch[id_col],
            "dl": pa.array((s.str.count(" ") + 1).astype("int64").to_numpy()),
        }
        for t in terms:
            cols[f"tf_{t}"] = pa.array(
                toks.map(lambda xs, t=t: sum(1 for x in xs if x == t))
                .astype("int64")
                .to_numpy()
            )
        return pa.table(cols)

    counted = docs.map_batches(_tf, batch_format="pyarrow")

    def _partials(batch: pa.Table) -> pa.Table:
        out = {
            "n_docs": pa.array([len(batch)], pa.int64()),
            "total_dl": pa.array([int(np.sum(batch["dl"].to_numpy()))]),
        }
        for t in terms:
            out[f"df_{t}"] = pa.array(
                [int(np.count_nonzero(batch[f"tf_{t}"].to_numpy()))]
            )
        return pa.table(out)

    stats = (
        counted.map_batches(_partials, batch_format="pyarrow")
        .sum(["n_docs", "total_dl"] + [f"df_{t}" for t in terms])
    )
    n_docs = stats["sum(n_docs)"]
    avgdl = stats["sum(total_dl)"] / n_docs
    idf = {
        t: math.log((n_docs - stats[f"sum(df_{t})"] + 0.5)
                    / (stats[f"sum(df_{t})"] + 0.5) + 1.0)
        for t in terms
    }

    def _score(batch: pa.Table) -> pa.Table:
        dl = batch["dl"].to_numpy().astype(np.float64)
        score = np.zeros(len(batch), dtype=np.float64)
        for t in terms:  # ascending term order = the twin's + chain
            tf = batch[f"tf_{t}"].to_numpy().astype(np.float64)
            denom = tf + k1 * (1.0 - b + b * (dl / avgdl))
            score = score + idf[t] * (tf * (k1 + 1.0)) / denom
        return pa.table({id_col: batch[id_col], "score": pa.array(score)})

    return counted.map_batches(_score, batch_format="pyarrow")


def bigram_lm(
    docs: Dataset,
    text_col: str = "text",
) -> Dataset:
    """Bigram language-model table: (w1, w2, n, p) with p = n / count(w1).

    The LM-data primitive (count-based conditional probabilities over
    the corpus): each batch folds its texts to (w1, w2) partial counts
    in one vectorized pass (tokens of all docs concatenated, windows
    straddling doc boundaries masked — no per-doc loop), a
    vocabulary²-bounded groupby-Sum merges them, and the conditional
    divides by the broadcast unigram context counts — one exact
    int/int double division per row, so ``p`` is bit-equal to the twin.
    Context counts use NON-FINAL token positions (every position that
    has a successor), i.e. sum of p over w2 given w1 is exactly 1.
    """
    import ray

    from ray.data.aggregate import Sum

    def _fold(batch: pa.Table) -> pa.Table:
        s = batch[text_col].to_pandas().astype("string")
        toks = s.str.split(" ")
        lens = toks.map(len).to_numpy()
        flat = np.array([t for lst in toks for t in lst], dtype=object)
        if len(flat) < 2:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        ends = np.cumsum(lens)
        pos = np.arange(len(flat) - 1)
        doc = np.searchsorted(ends, pos, side="right")
        valid = pos + 2 <= ends[doc]  # bigram fits inside one doc
        df = pd.DataFrame({"w1": flat[:-1][valid], "w2": flat[1:][valid]})
        part = df.groupby(["w1", "w2"], sort=False, as_index=False).size()
        return pa.table(
            {
                "w1": pa.array(part["w1"].to_numpy(), pa.string()),
                "w2": pa.array(part["w2"].to_numpy(), pa.string()),
                "n": pa.array(part["size"].to_numpy().astype(np.int64)),
            }
        )

    merged = (
        docs.map_batches(_fold, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(Sum("n", alias_name="n"))
        .materialize()
    )

    # context counts: vocabulary-bounded — derive from the merged table
    # itself (sum over w2), broadcast
    def _ctx_partial(batch: pa.Table) -> pa.Table:
        df = (
            batch.to_pandas().groupby("w1", sort=False, as_index=False)["n"].sum()
        )
        return pa.table({"w1": pa.array(df["w1"].to_numpy(), pa.string()),
                         "c": pa.array(df["n"].to_numpy().astype(np.int64))})

    ctx_rows = (
        merged.map_batches(_ctx_partial, batch_format="pyarrow")
        .groupby("w1")
        .aggregate(Sum("c", alias_name="c"))
        .take_all()
    )
    ctx = {r["w1"]: int(r["c"]) for r in ctx_rows}
    ctx_ref = ray.put(ctx)

    def _prob(batch: pa.Table) -> pa.Table:
        table = ray.get(ctx_ref)
        w1 = np.asarray(batch["w1"]).astype(object)
        n = batch["n"].to_numpy().astype(np.int64)
        c = np.array([table[w] for w in w1], dtype=np.int64)
        return batch.append_column("p", pa.array(n / c))

    return merged.map_batches(_prob, batch_format="pyarrow")


def pmi_table(
    docs: Dataset,
    text_col: str = "text",
    min_n: int = 2,
) -> Dataset:
    """Pointwise mutual information per bigram — collocation mining.

    ``pmi(w1, w2) = ln( (n12 * T) / (c1 * c2) )`` over the corpus
    bigram table (T = total bigrams, c = unigram context/successor
    totals). All counts are exact int64 from the same bounded folds as
    :func:`bigram_lm`; the single ``math.log`` per surviving bigram is
    libm (= the twin's ``ln``), and the argument is one exact-int
    ratio, so pmi is float64-exact. ``min_n`` prunes hapax bigrams
    (standard practice — PMI of count-1 pairs is noise).

    c1 counts w1 as a bigram LEFT context, c2 counts w2 as a RIGHT
    successor — the asymmetric convention that makes rows sum
    consistently on both sides of the twin.
    """
    import math

    import ray

    from ray.data.aggregate import Sum

    merged = (
        bigram_lm(docs, text_col=text_col)
        .drop_columns(["p"])
        .materialize()
    )

    def _margins(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        left = df.groupby("w1", sort=False, as_index=False)["n"].sum()
        right = df.groupby("w2", sort=False, as_index=False)["n"].sum()
        return pa.table(
            {
                "w": pa.array(
                    np.concatenate([left["w1"].to_numpy(), right["w2"].to_numpy()]),
                    pa.string(),
                ),
                "c1": pa.array(
                    np.concatenate(
                        [left["n"].to_numpy(), np.zeros(len(right), dtype=np.int64)]
                    ).astype(np.int64)
                ),
                "c2": pa.array(
                    np.concatenate(
                        [np.zeros(len(left), dtype=np.int64), right["n"].to_numpy()]
                    ).astype(np.int64)
                ),
            }
        )

    margin_rows = (
        merged.map_batches(_margins, batch_format="pyarrow")
        .groupby("w")
        .aggregate(Sum("c1", alias_name="c1"), Sum("c2", alias_name="c2"))
        .take_all()
    )  # vocabulary-bounded
    c1 = {r["w"]: int(r["c1"]) for r in margin_rows}
    c2 = {r["w"]: int(r["c2"]) for r in margin_rows}
    total = sum(c1.values())
    ref = ray.put((c1, c2, total))

    def _pmi(batch: pa.Table) -> pa.Table:
        lc, rc, T = ray.get(ref)
        keep = batch.filter(
            pa.compute.greater_equal(batch["n"], pa.scalar(min_n))
        )
        w1 = np.asarray(keep["w1"]).astype(object)
        w2 = np.asarray(keep["w2"]).astype(object)
        n = keep["n"].to_numpy().astype(np.int64)
        pmi = np.fromiter(
            (
                math.log(float(int(nn) * T) / float(lc[a] * rc[b]))
                for a, b, nn in zip(w1, w2, n)
            ),
            dtype=np.float64,
            count=len(n),
        )
        return keep.append_column("pmi", pa.array(pmi))

    return merged.map_batches(_pmi, batch_format="pyarrow")


#: fixed-point scale of the CCNet bucket LM score (2^20)
CCNET_SCALE = 1 << 20


def ccnet_buckets(
    docs: Dataset,
    text_col: str = "text",
    lang_col: str = "lang",
    id_col: str = "doc_id",
) -> Dataset:
    """CCNet-style corpus bucketing (Wenzek et al. 2020): score every
    document under a corpus bigram LM, then split each LANGUAGE into
    exact terciles by score — head / middle / tail, the buckets CCNet
    feeds to curriculum and filtering.

    Documented deviation (same rationale as the DSIR op): the
    perplexity ``exp(-mean log p)`` is replaced by the fixed-point mean
    conditional probability ``score = (Σ (n·SCALE)//c) // n_bigrams`` —
    no float log on either side, so the twin reproduces scores and
    bucket boundaries bit-for-bit. Ascending score ⇒ bucket 0 is the
    LEAST predictable (CCNet's tail) and bucket 2 the head.

    Scale shape: the LM table is vocabulary²-bounded and broadcast once
    via ``ray.put`` — the production CCNet shape, where the LM is a
    fixed model shipped to every worker, not reduced per job. Scoring
    is row-local; the per-language tercile uses the engine's
    distributed rank (bucketed rank exchange, no global sort) over a
    language-packed score key plus a languages-sized base-offset table.
    """
    import ray
    from ray.data.aggregate import Sum

    from .rank import global_rank

    lm_rows = (
        bigram_lm(docs.select_columns([text_col]))
        .select_columns(["w1", "w2", "n"])
        .take_all()
    )  # model-sized broadcast (vocab²-bounded), shipped once
    ctx: dict[str, int] = {}
    for r in lm_rows:
        ctx[r["w1"]] = ctx.get(r["w1"], 0) + int(r["n"])
    # key joined on a SPACE — tokens are whitespace-split so the join
    # is unambiguous; a NUL separator would be silently DROPPED by
    # pandas' numpy-backed string concat (C-string semantics)
    pgram = {
        f"{r['w1']} {r['w2']}": int(r["n"]) * CCNET_SCALE // ctx[r["w1"]]
        for r in lm_rows
    }
    pgram_ref = ray.put(pgram)

    # deterministic language packing (languages are a bounded vocabulary)
    lang_rows = (
        docs.select_columns([lang_col])
        .groupby(lang_col)
        .count()
        .take_all()
    )
    langs = sorted(r[lang_col] for r in lang_rows)
    lang_idx = {l: i for i, l in enumerate(langs)}
    lang_n = {r[lang_col]: int(r["count()"]) for r in lang_rows}
    # per-language base offset in the packed global rank order
    bases, acc = {}, 0
    for l in langs:
        bases[l] = acc
        acc += lang_n[l]
    pack_stride = CCNET_SCALE + 1  # scores are means of values ≤ SCALE

    def _score(batch: pa.Table) -> pa.Table:
        from .dsir import explode_grams

        table = ray.get(pgram_ref)
        df = batch.select([id_col, lang_col, text_col]).to_pandas()
        _, big = explode_grams(df[text_col])
        vals = big.map(table).fillna(0).astype("int64")
        num = vals.groupby(level=0).sum().reindex(df.index, fill_value=0)
        nb = big.groupby(level=0).size().reindex(df.index, fill_value=0)
        score = (num // nb.clip(lower=1)).astype("int64")
        li = df[lang_col].map(lang_idx).astype("int64")
        return pa.table(
            {
                id_col: pa.array(df[id_col].to_numpy(dtype=np.int64)),
                lang_col: pa.array(df[lang_col], type=pa.string()),
                "score": pa.array(score.to_numpy()),
                "packed": pa.array(
                    (li * pack_stride + score).to_numpy(dtype=np.int64)
                ),
            }
        )

    # materialize: scored feeds three consumers (global_rank's bounded
    # cell counts, the ranked branch and the join's key branch) — without
    # this the full scoring pipeline re-executes per consumer
    scored = docs.map_batches(_score, batch_format="pyarrow").materialize()
    ranked = global_rank(scored, score_col="packed", id_col=id_col)
    keyed = scored.select_columns([id_col, lang_col, "score"])

    # stitch rank back onto (lang, score) — equi join on the id
    from .join import equi_join

    joined = equi_join(
        keyed, ranked.select_columns([id_col, "rank"]), on=id_col
    )

    def _bucket(batch: pa.Table) -> pa.Table:
        lang = np.asarray(batch[lang_col]).astype(object)
        rank = batch["rank"].to_numpy().astype(np.int64)
        base = np.array([bases[l] for l in lang], dtype=np.int64)
        n = np.array([lang_n[l] for l in lang], dtype=np.int64)
        bucket = (rank - base - 1) * 3 // n
        return pa.table(
            {
                id_col: batch[id_col].combine_chunks().cast(pa.int64()),
                lang_col: pa.array(lang, type=pa.string()),
                "score": batch["score"].combine_chunks().cast(pa.int64()),
                "bucket": pa.array(bucket),
            }
        )

    return joined.map_batches(_bucket, batch_format="pyarrow")
