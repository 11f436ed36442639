"""Semantic Japanese phrase segmentation (the M16 gap): the public BudouX
inference algorithm with a hand-built deterministic model.

The reference loads ``budoux.load_default_japanese_parser()`` once per
generator and splits text into semantically coherent chunks
(manga_ocr_dev/synthetic_data_generator/common/base_generator.py:63,129-155).
BudouX is a linear boundary classifier over character-window features — for
each position ``i`` it sums the weights of up to 13 features (unigrams
UW1..UW6 at offsets i-3..i+2, bigrams BW1..BW3, trigrams TW1..TW4) and
inserts a break when the score clears the bias.  :func:`parse` implements
that public algorithm exactly (feature windows, guard conditions, and the
trained-model bias convention ``-total_weight/2``), so a user can drop in a
real BudouX JSON model unchanged.

The trained Japanese model itself is not shipped (no network in this
environment, and its weights are data, not algorithm).  Instead
:data:`DEFAULT_JA_MODEL` is a small hand-built model over public Japanese
grammar facts that yields bunsetsu-style phrase chunks — break after case
particles and punctuation, never before closing punctuation / small kana /
the long-vowel mark — with an EXPLICIT ``__bias__`` of 0 (score > 0 breaks;
absent evidence means no break, so kana/latin/kanji runs stay whole).  The
model is a plain dict: swap in trained weights and everything downstream
(scalar parse, vectorized batch path, actor stage, registry step) is
unchanged.

Two execution paths, property-tested equal:

- :func:`parse` — scalar reference implementation (per-char Python loop).
- :class:`JaSegmentStage` — actor-pool batch path: all docs in a batch are
  joined into one codepoint array (``\\x00`` padding, never a real char),
  every feature group becomes ONE packed-key ``np.searchsorted`` lookup over
  shifted views, and boundaries fall out of a single vectorized score
  comparison.  No per-char Python in the hot path; only per-chunk output
  slicing remains.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# feature group -> window of character offsets relative to the boundary
# position i (a break is inserted BEFORE character i).  Exactly BudouX's
# feature templates.
_FEATURE_OFFSETS: dict[str, tuple[int, ...]] = {
    "UW1": (-3,),
    "UW2": (-2,),
    "UW3": (-1,),
    "UW4": (0,),
    "UW5": (1,),
    "UW6": (2,),
    "BW1": (-2, -1),
    "BW2": (-1, 0),
    "BW3": (0, 1),
    "TW1": (-3, -2, -1),
    "TW2": (-2, -1, 0),
    "TW3": (-1, 0, 1),
    "TW4": (0, 1, 2),
}

_BIAS_KEY = "__bias__"


def _model_bias(model: dict) -> float:
    """Explicit ``__bias__`` if present, else BudouX's trained-model
    convention: start each position at minus half the total weight."""
    bias = model.get(_BIAS_KEY)
    if bias is not None:
        return float(bias)
    total = sum(
        sum(group.values()) for k, group in model.items() if k != _BIAS_KEY
    )
    return -total / 2.0


def parse(text: str, model: dict) -> list[str]:
    """Split ``text`` into phrase chunks — the public BudouX algorithm.

    A feature only fires when its whole window is inside the string (BudouX's
    ``if i > 2`` guards); a break happens when ``bias + Σ weights > 0``.
    """
    if not text:
        return []
    bias = _model_bias(model)
    n = len(text)
    chunks = [text[0]]
    for i in range(1, n):
        score = bias
        for group, offsets in _FEATURE_OFFSETS.items():
            lo, hi = i + offsets[0], i + offsets[-1]
            if lo < 0 or hi >= n:
                continue
            g = model.get(group)
            if g:
                score += g.get(text[lo : hi + 1], 0)
        if score > 0:
            chunks.append(text[i])
        else:
            chunks[-1] += text[i]
    return chunks


# ---- default hand-built phrase model ---------------------------------------

# Case/binding particles: a bunsetsu typically ends after one of these.
_PARTICLES = "はがをにでとものへや"
# Sentence/clause punctuation (post-normalize text is fullwidth; keep the
# ascii forms too for raw text): the break goes AFTER the mark.
_BREAK_AFTER_PUNCT = "。、！？．!?,"
# Closers attach to what they close; break after them.
_CLOSERS = "」』）)]｝}"
# Never break BEFORE: closing punctuation, small kana (word-internal by
# definition), the long-vowel mark, ん (never word-initial), and whitespace
# (a space attaches to the chunk it terminates).
_NO_BREAK_BEFORE = "。、！？．!?,ーゃゅょぁぃぅぇぉっゎんゝゞ々" + _CLOSERS + " 　"
# Openers start a new chunk: break before them.
_OPENERS = "「『（([｛{"

# Bigram counterweights for particle chars that are word-internal in very
# common function words (にち in こんにちは/日にち, です/でし copulas, にゅ/
# にょ handled by the small-kana rule already).  -150 outweighs the +100
# particle vote.
_PARTICLE_EXCEPTIONS = {
    "にち": -150.0, "もな": -150.0, "のよ": -150.0,
    "です": -150.0, "でし": -150.0,
}

DEFAULT_JA_MODEL: dict = {
    _BIAS_KEY: 0.0,
    "UW3": {
        **{c: 100.0 for c in _PARTICLES},
        **{c: 1000.0 for c in _BREAK_AFTER_PUNCT},
        **{c: 500.0 for c in _CLOSERS},
        " ": 1000.0,
        "　": 1000.0,
    },
    "UW4": {
        **{c: -2000.0 for c in _NO_BREAK_BEFORE},
        **{c: 500.0 for c in _OPENERS},
    },
    "BW2": dict(_PARTICLE_EXCEPTIONS),
}


# ---- vectorized batch path --------------------------------------------------

_PAD = 3  # max |offset| in the feature windows
_SHIFT = np.uint64(21)  # 21 bits per codepoint (max U+10FFFF) in packed keys


def _pack(chars: str) -> int:
    key = 0
    for c in chars:
        key = (key << 21) | ord(c)
    return key


class _GroupLUT:
    """One feature group as sorted packed-key + weight arrays for
    ``np.searchsorted`` lookup over the whole batch at once."""

    def __init__(self, group: dict[str, float], offsets: tuple[int, ...]):
        self.offsets = offsets
        items = sorted((_pack(k), float(w)) for k, w in group.items()
                       if len(k) == len(offsets))
        self.keys = np.array([k for k, _ in items], dtype=np.uint64)
        self.weights = np.array([w for _, w in items], dtype=np.float64)

    def lookup(self, cp: np.ndarray, pos: np.ndarray) -> np.ndarray:
        """Sum of this group's weights at each boundary position.  ``cp`` is
        the padded codepoint array, ``pos`` the global boundary indices; pad
        codepoints are 0, which no packed key of a real string contains, so
        windows that cross a document edge are lookup misses — exactly the
        scalar guard conditions."""
        if not len(self.keys):
            return np.zeros(len(pos), dtype=np.float64)
        key = np.zeros(len(pos), dtype=np.uint64)
        for off in self.offsets:
            key = (key << _SHIFT) | cp[pos + off].astype(np.uint64)
        idx = np.searchsorted(self.keys, key)
        idx[idx == len(self.keys)] = 0
        hit = self.keys[idx] == key
        return np.where(hit, self.weights[idx], 0.0)


class JaSegmenter:
    """Batch segmenter: compile the model once, segment many texts at once."""

    def __init__(self, model: dict | None = None):
        self.model = DEFAULT_JA_MODEL if model is None else model
        self.bias = _model_bias(self.model)
        self.luts = [
            _GroupLUT(self.model[g], offs)
            for g, offs in _FEATURE_OFFSETS.items()
            if self.model.get(g)
        ]

    def segment_batch(self, texts: list[str]) -> list[list[str]]:
        if not texts:
            return []
        pad = "\x00" * _PAD
        joined = pad + pad.join(t.replace("\x00", "") for t in texts) + pad
        cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
        real = cp != 0
        # boundary candidates: real char whose predecessor is also real
        pos = np.nonzero(real[1:] & real[:-1])[0] + 1
        score = np.full(len(pos), self.bias, dtype=np.float64)
        for lut in self.luts:
            score += lut.lookup(cp, pos)
        bpos = pos[score > 0]  # sorted global break positions
        # walk documents by their known offsets in `joined`; each doc's cuts
        # are one searchsorted slice of bpos — no per-char Python
        out: list[list[str]] = []
        at = _PAD
        for t in texts:
            t = t.replace("\x00", "")
            n = len(t)
            if n == 0:
                out.append([])
                at += n + _PAD
                continue
            lo = np.searchsorted(bpos, at + 1)
            hi = np.searchsorted(bpos, at + n)
            bounds = [0, *(bpos[lo:hi] - at).tolist(), n]
            out.append([t[a:b] for a, b in zip(bounds, bounds[1:])])
            at += n + _PAD
        return out


class JaSegmentStage:
    """Actor-pool stage (reference: BudouX parser loaded once per generator,
    base_generator.py:63): compiles the model in ``__init__``, segments each
    batch vectorized, and appends ``<out_col>`` (list<string> chunks) and
    ``n_<out_col>`` (chunk count).  Pass ``model=`` to use trained BudouX
    JSON weights instead of the hand-built default."""

    def __init__(self, text_col: str = "text", out_col: str = "ja_chunks",
                 model: dict | None = None):
        self.text_col = text_col
        self.out_col = out_col
        self.segmenter = JaSegmenter(model)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].fill_null("").to_pylist()
        chunks = self.segmenter.segment_batch(texts)
        batch = batch.append_column(
            self.out_col, pa.array(chunks, pa.list_(pa.string())))
        return batch.append_column(
            f"n_{self.out_col}",
            pa.array([len(c) for c in chunks], pa.int64()))
