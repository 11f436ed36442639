"""Deterministic synthetic transcript corpus with by-construction golden output.

Mirrors the reference's fixture strategy inverted: the reference *renders*
markup from known ground-truth text (manga_ocr_dev/synthetic_data_generator/
generator.py:184-280 builds ruby/tcy markup; base_generator.py:157-196 does
line breaking) and its golden test pins expected strings
(tests/data/expected_results.json, asserted in tests/test_ocr.py:21-41).

Here we generate ground-truth main content first, then WRAP it in HTML
boilerplate / PDF layout / tool-JSON noise whose extraction rules provably
invert the wrap — so ``expected_text = post_process(ground_truth)`` is exact
by construction, and the golden per-turn table is emitted alongside the
transcripts.

Every row is a pure function of ``(seed, conv_index, turn_index)`` (Philox
counter RNG keyed per conversation), so generation is deterministic under any
partitioning / parallelism — rows can be produced by ``map_batches`` over a
conversation-index range at any scale.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from .functions.normalize import post_process
from .schema import EXPECTED_TURNS_SCHEMA, TRANSCRIPTS_SCHEMA

# Word pool exercises every normalization kernel: half-width kana (with
# dakuten pairs), half-width ascii/digits, ellipsis, dot runs, ideographic
# space handling, entity-escaped characters.
_WORDS = [
    "こんにちは", "世界", "データ", "ﾃﾞｰﾀ", "ﾊﾟｲﾌﾟﾗｲﾝ", "処理", "変換",
    "テスト", "結果", "abc", "hello", "pipeline", "extraction", "123",
    "456", "ｶﾞｷﾞｸﾞ", "ﾍﾟｰｼﾞ", "A&B", "x<y", "q>p", "it's", "…", "まとめ",
    "重要", "本文", "ですね", "します", "した。", "どうも・・", "終わり...",
    "conversation", "transcripts", "ドキュメント", "レイアウト", "構造",
]
_RUBY_READINGS = ["よみ", "かな", "ふりがな", "ルビ"]
_SPACES = [" ", "　", "  ", " "]
_NAV_WORDS = ["Home", "About", "Products", "Contact", "Login", "Archive"]

EPOCH_US = 1_700_000_000_000_000  # fixed base timestamp (us)


def _escape(text: str) -> str:
    return text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _gen_ground_truth(rng: np.random.Generator) -> list[str]:
    """A list of sentences (strings of pool words joined by random spaces)."""
    sentences = []
    for _ in range(int(rng.integers(1, 5))):
        n = int(rng.integers(3, 11))
        words = [_WORDS[int(i)] for i in rng.integers(0, len(_WORDS), n)]
        seps = [_SPACES[int(i)] for i in rng.integers(0, len(_SPACES), n - 1)]
        s = words[0]
        for sep, w in zip(seps, words[1:]):
            s += sep + w
        sentences.append(s)
    return sentences


def _wrap_html(sentences: list[str], rng: np.random.Generator) -> str:
    """HTML with boilerplate; extract_main_html provably recovers sentences."""
    paras = []
    for s in sentences:
        esc = _escape(s)
        if rng.random() < 0.3:
            # ruby-annotate one word (reading must be dropped by extraction)
            words = esc.split(" ")
            k = int(rng.integers(0, len(words)))
            if words[k] and "&" not in words[k]:
                reading = _RUBY_READINGS[int(rng.integers(0, len(_RUBY_READINGS)))]
                words[k] = f"<ruby>{words[k]}<rt>{reading}</rt></ruby>"
            esc = " ".join(words)
        if rng.random() < 0.2:
            esc = esc.replace(" ", "&nbsp;", 1)
        tag = ["p", "div", "h2"][int(rng.integers(0, 3))]
        paras.append(f"<{tag}>{esc}</{tag}>")
    nav_links = " ".join(
        f'<a href="/{w.lower()}">{w}</a>'
        for w in rng.choice(_NAV_WORDS, 3, replace=False)
    )
    link_farm = (
        f'<div>{nav_links} <a href="/x">more</a></div>' if rng.random() < 0.5 else ""
    )
    return (
        "<!DOCTYPE html><html><head><title>Site</title>"
        "<style>body { color: #333; }</style>"
        "<script>var tracker = 'id';</script></head>"
        f"<body><header><h1>Site Title</h1></header><nav>{nav_links}</nav>"
        f"<!-- boilerplate -->{link_farm}<main>{''.join(paras)}</main>"
        f'<footer><a href="/contact">Contact</a> (c) 2026</footer></body></html>'
    )


def _wrap_pdf(sentences: list[str], rng: np.random.Generator) -> str:
    """Hard-wrapped paged layout; flatten_pdf_array provably inverts it."""
    words: list[str] = []
    for s in sentences:
        words.extend(s.split())
    lines: list[str] = []
    cur = ""
    for w in words:
        # break long pure-ascii words with end-of-line hyphenation
        if len(cur) + len(w) > 48 and len(w) >= 8 and w.isascii() and w.isalpha():
            cut = len(w) // 2
            lines.append((cur + " " if cur else "") + w[:cut] + "-")
            cur = w[cut:]
            continue
        if len(cur) + len(w) > 48 and cur:
            # a wrapped line must not look like a bare page-number footer
            if cur.strip().isdigit():
                cur += " " + w
                continue
            lines.append(cur)
            cur = w
        else:
            cur = (cur + " " + w) if cur else w
    if cur:
        if cur.strip().isdigit() and lines:
            lines[-1] += " " + cur
        else:
            lines.append(cur)
    pages: list[str] = []
    per_page = 6
    for p in range(0, len(lines), per_page):
        body = "\n".join(lines[p : p + per_page])
        pageno = p // per_page + 1
        pages.append(f"Page {pageno} of {(len(lines) - 1) // per_page + 1}\n{body}\n{pageno}")
    return "\f".join(pages)


def _wrap_json(sentences: list[str], rng: np.random.Generator) -> str:
    return json.dumps(
        {
            "tool": "search",
            "status": "ok",
            "content": " ".join(sentences),
            "latency_ms": int(rng.integers(1, 500)),
        },
        ensure_ascii=False,
    )


_KINDS = ["", "html", "pdf", "json"]
_KIND_P = [0.35, 0.3, 0.2, 0.15]


def gen_conversation(
    conv_index: int, seed: int = 42, mega_turns: int | None = None, mean_turns: int = 8
) -> tuple[list[dict], list[dict]]:
    """Generate one conversation; returns (transcript_rows, expected_rows)."""
    rng = np.random.Generator(np.random.Philox(key=[seed, conv_index]))
    n_turns = mega_turns if mega_turns else int(rng.integers(2, 2 * mean_turns))
    conv_id = f"conv_{conv_index:08d}"
    rows, expected = [], []
    for t in range(n_turns):
        sentences = _gen_ground_truth(rng)
        kind = _KINDS[int(rng.choice(len(_KINDS), p=_KIND_P))]
        if kind == "html":
            payload = _wrap_html(sentences, rng)
        elif kind == "pdf":
            payload = _wrap_pdf(sentences, rng)
        elif kind == "json":
            payload = _wrap_json(sentences, rng)
        else:
            payload = " ".join(sentences)
        role = "tool" if kind == "json" else ("user" if t % 2 == 0 else "assistant")
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": role,
                "text": payload,
                "tool": kind,
                "ts": EPOCH_US + conv_index * 86_400_000_000 + t * 60_000_000,
            }
        )
        expected.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "expected_text": post_process(" ".join(sentences)),
            }
        )
    return rows, expected


def conv_batch_to_tables(
    conv_indices: np.ndarray,
    seed: int = 42,
    mega_every: int = 0,
    mega_turns: int = 400,
    mean_turns: int = 8,
) -> tuple[pa.Table, pa.Table]:
    """Vector of conversation indices → (transcripts, expected) Arrow tables."""
    rows: list[dict] = []
    exp: list[dict] = []
    for ci in conv_indices:
        ci = int(ci)
        mt = mega_turns if (mega_every and ci % mega_every == 0) else None
        r, e = gen_conversation(ci, seed=seed, mega_turns=mt, mean_turns=mean_turns)
        rows.extend(r)
        exp.extend(e)
    return (
        pa.Table.from_pylist(rows, schema=TRANSCRIPTS_SCHEMA),
        pa.Table.from_pylist(exp, schema=EXPECTED_TURNS_SCHEMA),
    )


def make_tables(
    n_convs: int, seed: int = 42, mega_every: int = 0, mega_turns: int = 400
) -> tuple[pa.Table, pa.Table]:
    """Driver-side generation for tests/small fixtures."""
    return conv_batch_to_tables(
        np.arange(n_convs), seed=seed, mega_every=mega_every, mega_turns=mega_turns
    )


def transcripts_dataset(
    n_convs: int,
    seed: int = 42,
    mega_every: int = 0,
    mega_turns: int = 400,
    mean_turns: int = 8,
    convs_per_block: int = 200,
):
    """Distributed generation: a Ray Dataset of transcript rows.

    ``ray.data.range(n_convs)`` → ``map_batches`` over conversation indices;
    each task generates its conversations independently (pure per-index
    function), so this scales to any corpus size without a driver loop.
    """
    import ray.data as rd

    def _gen(batch: pa.Table) -> pa.Table:
        t, _ = conv_batch_to_tables(
            batch["id"].to_numpy(), seed=seed, mega_every=mega_every,
            mega_turns=mega_turns, mean_turns=mean_turns,
        )
        return t

    return rd.range(n_convs, override_num_blocks=max(1, n_convs // convs_per_block)).map_batches(
        _gen, batch_format="pyarrow", batch_size=convs_per_block
    )


def expected_dataset(n_convs: int, seed: int = 42, mega_every: int = 0,
                     mega_turns: int = 400, mean_turns: int = 8,
                     convs_per_block: int = 200):
    """Distributed golden-output table matching :func:`transcripts_dataset`."""
    import ray.data as rd

    def _gen(batch: pa.Table) -> pa.Table:
        _, e = conv_batch_to_tables(
            batch["id"].to_numpy(), seed=seed, mega_every=mega_every,
            mega_turns=mega_turns, mean_turns=mean_turns,
        )
        return e

    return rd.range(n_convs, override_num_blocks=max(1, n_convs // convs_per_block)).map_batches(
        _gen, batch_format="pyarrow", batch_size=convs_per_block
    )
