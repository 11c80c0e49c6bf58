"""Text-analysis stages for large-scale training-data pipelines:
token counting, language ID, quality scoring, document fingerprinting.

All stages are vectorized ``map_batches`` bodies (pyarrow.compute regex
kernels / numpy); the language-ID stage is a callable CLASS so pattern
compilation happens once per actor (stateful-stage shape), though it is
cheap enough to run as fused stateless tasks too.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


TOKEN_RE = r"\S+"


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count — semantics identical to DuckDB
    ``len(regexp_extract_all(text, '\\S+'))`` (empty → 0)."""
    n = pc.count_substring_regex(batch[text_col], TOKEN_RE)
    return batch.append_column("n_tokens", n.cast(pa.int64()))


def add_token_count(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    return ds.map_batches(
        lambda b: token_count_batch(b, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )


# ------------------------------------------------------------ language id

_LANG_MARKERS = {
    "en": r"\b(the|and|of|to|a|in|is|that|it|for)\b",
    "de": r"\b(der|die|das|und|ist|nicht|ein|eine|mit|von)\b",
    "fr": r"\b(le|la|les|et|est|une|un|des|dans|pour)\b",
    "es": r"\b(el|los|las|y|es|una|un|de|en|por)\b",
}
_CJK = r"[一-鿿]"


class LanguageId:
    """n-gram/marker-word language heuristic (en/de/fr/es/zh).

    Scores = marker-hit counts per language (CJK codepoint count for zh),
    normalized by token count; argmax wins, 'und' (undetermined) when all
    scores are zero. Compilation happens once per actor instance.
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.langs = list(_LANG_MARKERS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = pc.utf8_lower(batch[self.text_col])
        scores = np.zeros((len(batch), len(self.langs) + 1), dtype=np.float64)
        for i, lang in enumerate(self.langs):
            scores[:, i] = (
                pc.count_substring_regex(text, _LANG_MARKERS[lang])
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
            )
        # zh: fraction of CJK codepoints (marker words don't apply)
        cjk = pc.count_substring_regex(text, _CJK).to_numpy(zero_copy_only=False)
        scores[:, -1] = cjk * 2.0  # CJK chars are strong evidence
        best = np.argmax(scores, axis=1)
        none = scores.max(axis=1) == 0
        labels = np.asarray(self.langs + ["zh"], dtype=object)[best]
        labels[none] = "und"
        return batch.append_column("lang_pred", pa.array(labels.tolist(), pa.string()))


def add_language_id(ds: ray.data.Dataset, text_col: str = "text", concurrency=None):
    if concurrency:
        return ds.map_batches(
            LanguageId,
            fn_constructor_args=(text_col,),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=4096,
            concurrency=concurrency,
        )
    stage = LanguageId(text_col)
    return ds.map_batches(
        stage, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


# ---------------------------------------------------------- quality score

def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Length / punctuation / digit / stopword-ish ratios + a composite
    quality score in [0,1]. All pyarrow/numpy vectorized."""
    text = batch[text_col]
    n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.float64)
    n_tokens = (
        pc.count_substring_regex(text, TOKEN_RE)
        .to_numpy(zero_copy_only=False)
        .astype(np.float64)
    )
    n_digits = (
        pc.count_substring_regex(text, r"[0-9]")
        .to_numpy(zero_copy_only=False)
        .astype(np.float64)
    )
    n_punct = (
        pc.count_substring_regex(text, r"[!-/:-@\[-`{-~]")
        .to_numpy(zero_copy_only=False)
        .astype(np.float64)
    )
    n_stop = (
        pc.count_substring_regex(
            pc.utf8_lower(text), _LANG_MARKERS["en"]
        )
        .to_numpy(zero_copy_only=False)
        .astype(np.float64)
    )
    with np.errstate(invalid="ignore", divide="ignore"):
        mean_tok_len = np.where(n_tokens > 0, (n_chars - (n_tokens - 1)) / np.maximum(n_tokens, 1), 0.0)
        digit_ratio = np.where(n_chars > 0, n_digits / n_chars, 0.0)
        punct_ratio = np.where(n_chars > 0, n_punct / n_chars, 0.0)
        stop_ratio = np.where(n_tokens > 0, n_stop / np.maximum(n_tokens, 1), 0.0)
    score = np.clip(
        0.35 * np.clip(n_tokens / 64.0, 0, 1)
        + 0.25 * np.clip(1.0 - digit_ratio * 5, 0, 1)
        + 0.2 * np.clip(1.0 - punct_ratio * 5, 0, 1)
        + 0.2 * np.clip(stop_ratio * 4, 0, 1),
        0.0,
        1.0,
    )
    return (
        batch.append_column("n_tokens", pa.array(n_tokens.astype(np.int64)))
        .append_column("n_digits", pa.array(n_digits.astype(np.int64)))
        # half-away-from-zero at 6 dp (scores are dyadic — n_tokens/64
        # etc. — so exact .5e-6 ties DO occur; np.round's half-even would
        # diverge from SQL round())
        .append_column("quality", pa.array(np.floor(score * 1e6 + 0.5) / 1e6))
    )


def add_quality(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    return ds.map_batches(
        lambda b: quality_batch(b, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )


# ---------------------------------------------------------- fingerprints

_WS = re.compile(r"\s+")


def normalize_text(s: str) -> str:
    """The canonical form for exact-dup detection: lowercase, collapsed
    whitespace, stripped — mirrors the SQL expression
    ``md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))``."""
    return _WS.sub(" ", s.lower()).strip()


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch[text_col].to_pylist()
    fps = [
        hashlib.md5(normalize_text(t or "").encode("utf-8")).hexdigest() for t in texts
    ]
    return batch.append_column("fingerprint", pa.array(fps, pa.string()))


def add_fingerprint(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    return ds.map_batches(
        lambda b: fingerprint_batch(b, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )


def token_histogram(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """Distributed wordcount: exact per-token corpus counts as
    ``(token, n)`` — the vocabulary table a tokenizer-training or
    quality-filter stage consumes.

    Tokenization is pure Arrow C (lower → collapse ``\\s+`` → trim →
    ``split_pattern`` on single spaces, matching DuckDB
    ``string_split(trim(regexp_replace(lower(text),'\\s+',' ','g')),' ')``
    semantics — an empty doc yields one empty token, both sides).
    Per-batch partial counts come from ``pc.value_counts`` (hash agg, no
    Python per token) and merge through an Arrow-groupby combine tree —
    no sort-shuffle barrier; requires the VOCABULARY (not the corpus) to
    fit one worker, true even at web scale (10⁷ tokens × ~30 B)."""

    def partial(batch: pa.Table) -> pa.Table:
        txt = batch[text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        norm = pc.utf8_trim(
            pc.replace_substring_regex(pc.utf8_lower(txt), r"\s+", " "),
            characters=" ",
        )
        flat = pc.list_flatten(pc.split_pattern(norm, " "))
        vc = pc.value_counts(flat)
        return pa.table(
            {
                "token": vc.field("values"),
                "partial_n": vc.field("counts").cast(pa.int64()),
            }
        )

    def combine(batch: pa.Table, out_name: str) -> pa.Table:
        g = batch.group_by("token").aggregate([("partial_n", "sum")])
        return pa.table({"token": g["token"], out_name: g["partial_n_sum"]})

    from georay.ops import COMBINE_TARGET_ROWS

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    comb = parts.map_batches(
        lambda b: combine(b, "partial_n"),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=COMBINE_TARGET_ROWS,
        num_cpus=0.5,
    )
    return comb.map_batches(
        lambda b: combine(b, "n"),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=1 << 40,
        num_cpus=0.9,
    )
