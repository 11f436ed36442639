"""Pipeline-step registry: declarative specs compiled to Dataset transforms.

The reference's only plugin mechanism is config-as-data: augmentation
pipelines are YAML lists of ``{name, params}`` compiled to callables
(/root/reference/manga_ocr_dev/training/augmentations.py:49-117), renderer
backends are switched by a ``renderer=`` tag (run_generate.py:123-174) and
data sources by a ``type`` tag (dataset.py:58-63).  This module mirrors that
surface Ray-Data-first: a step spec is ``{"op": <registered name>, ...params}``
and a pipeline spec is a list of steps compiled by :func:`build_pipeline`
into one ``Dataset -> Dataset`` callable.  Stateless steps become
``map_batches`` task functions; stateful ones (lang_id model, extraction
model) become actor-pool stages with ``concurrency``/``batch_size`` knobs
exposed as spec params.

Example::

    pipe = build_pipeline([
        {"op": "wrap_html"},
        {"op": "strip_html", "out_col": "stripped_text"},
        {"op": "normalize", "in_col": "stripped_text", "out_col": "clean_text"},
        {"op": "select", "columns": ["doc_id", "clean_text"]},
    ])
    out = pipe(ray.data.read_parquet(path))
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

Step = Callable[[rd.Dataset], rd.Dataset]
StepFactory = Callable[..., Step]

STEP_REGISTRY: dict[str, StepFactory] = {}


def register_step(name: str) -> Callable[[StepFactory], StepFactory]:
    """Register a step factory under ``name`` (last registration wins,
    matching the reference's dict-lookup override semantics)."""

    def deco(factory: StepFactory) -> StepFactory:
        STEP_REGISTRY[name] = factory
        return factory

    return deco


def build_pipeline(spec: list[dict]) -> Step:
    """Compile a list of ``{"op": name, ...params}`` dicts into one
    ``Dataset -> Dataset`` callable.  Unknown ops raise KeyError eagerly
    (compile time), not inside a Ray task."""
    steps: list[Step] = []
    for raw in spec:
        params = dict(raw)
        op = params.pop("op")
        if op not in STEP_REGISTRY:
            raise KeyError(
                f"unknown pipeline op {op!r}; registered: {sorted(STEP_REGISTRY)}"
            )
        steps.append(STEP_REGISTRY[op](**params))

    def run(ds: rd.Dataset) -> rd.Dataset:
        for step in steps:
            ds = step(ds)
        return ds

    return run


# ---- stateless kernel steps ------------------------------------------------

@register_step("wrap_html")
def _wrap_html(in_col: str = "text", out_col: str | None = None,
               pre: str | None = None, post: str | None = None) -> Step:
    """Fixture-noise injector (the M26 mangling analog): wraps each value in
    deterministic HTML boilerplate (defaults shared with the oracle queries
    in pipelines.documents)."""
    from .pipelines.documents import _HTML_POST, _HTML_PRE

    pre = _HTML_PRE if pre is None else pre
    post = _HTML_POST if post is None else post
    dst = out_col or in_col

    def step(ds: rd.Dataset) -> rd.Dataset:
        def fn(t: pa.Table) -> pa.Table:
            wrapped = pc.binary_join_element_wise(
                pa.scalar(pre), t[in_col].combine_chunks(), pa.scalar(post), ""
            )
            if dst in t.column_names:
                t = t.set_column(t.column_names.index(dst), dst, wrapped)
            else:
                t = t.append_column(dst, wrapped)
            return t

        return ds.map_batches(fn, batch_format="pyarrow")

    return step


def _column_kernel_step(in_col: str, out_col: str, kernel) -> Step:
    def step(ds: rd.Dataset) -> rd.Dataset:
        def fn(t: pa.Table) -> pa.Table:
            out = kernel(t[in_col])
            if out_col in t.column_names:
                return t.set_column(t.column_names.index(out_col), out_col, out)
            return t.append_column(out_col, out)

        return ds.map_batches(fn, batch_format="pyarrow")

    return step


@register_step("strip_html")
def _strip_html(in_col: str = "text", out_col: str = "stripped_text") -> Step:
    from .functions.html import strip_html_array

    return _column_kernel_step(in_col, out_col, strip_html_array)


@register_step("flatten_pdf")
def _flatten_pdf(in_col: str = "text", out_col: str = "flat_text") -> Step:
    from .functions.pdf import flatten_pdf_array

    return _column_kernel_step(in_col, out_col, flatten_pdf_array)


@register_step("normalize")
def _normalize(in_col: str = "text", out_col: str = "normalized_text") -> Step:
    from .functions.normalize import normalize_batch

    def step(ds: rd.Dataset) -> rd.Dataset:
        def fn(t: pa.Table) -> pa.Table:
            out = normalize_batch(t, in_col)["normalized_text"]
            if out_col in t.column_names:
                return t.set_column(t.column_names.index(out_col), out_col, out)
            return t.append_column(out_col, out)

        return ds.map_batches(fn, batch_format="pyarrow")

    return step


@register_step("token_count")
def _token_count(in_col: str = "text", out_col: str = "n_tokens") -> Step:
    from .functions.textstats import token_count_array

    return _column_kernel_step(
        in_col, out_col, lambda a: pc.cast(token_count_array(a), pa.int64())
    )


@register_step("quality")
def _quality(in_col: str = "text") -> Step:
    from .functions.textstats import quality_batch

    def step(ds: rd.Dataset) -> rd.Dataset:
        return ds.map_batches(lambda t: quality_batch(t, in_col), batch_format="pyarrow")

    return step


@register_step("fingerprint")
def _fingerprint(in_col: str = "text") -> Step:
    from .functions.textstats import fingerprint_map_batch

    def step(ds: rd.Dataset) -> rd.Dataset:
        return ds.map_batches(lambda t: fingerprint_map_batch(t, in_col),
                              batch_format="pyarrow")

    return step


@register_step("filter")
def _filter(expr: str) -> Step:
    def step(ds: rd.Dataset) -> rd.Dataset:
        return ds.filter(expr=expr)

    return step


@register_step("select")
def _select(columns: list[str]) -> Step:
    def step(ds: rd.Dataset) -> rd.Dataset:
        return ds.select_columns(columns)

    return step


@register_step("limit")
def _limit(n: int) -> Step:
    def step(ds: rd.Dataset) -> rd.Dataset:
        return ds.limit(n)

    return step


@register_step("repartition")
def _repartition(num_blocks: int) -> Step:
    def step(ds: rd.Dataset) -> rd.Dataset:
        return ds.repartition(num_blocks)

    return step


# ---- stateful actor-pool steps ---------------------------------------------

@register_step("lang_id")
def _lang_id(in_col: str = "text", out_col: str = "lang_pred",
             concurrency: int = 2, batch_size: int | None = None) -> Step:
    from .functions.textstats import LangIdStage

    def step(ds: rd.Dataset) -> rd.Dataset:
        return ds.map_batches(
            LangIdStage,
            fn_constructor_kwargs={"text_col": in_col, "out_col": out_col},
            batch_format="pyarrow", concurrency=concurrency, batch_size=batch_size,
        )

    return step


@register_step("ja_segment")
def _ja_segment(in_col: str = "text", out_col: str = "ja_chunks",
                model: dict | None = None, concurrency: int = 2,
                batch_size: int | None = None) -> Step:
    """Semantic Japanese phrase segmentation (M16): the BudouX inference
    algorithm compiled once per actor (reference base_generator.py:63,
    129-155).  ``model=None`` uses the hand-built default; pass trained
    BudouX JSON weights to reproduce the reference parser exactly.  The
    regex tokenizer (:func:`token_count` / TOKEN_PATTERN) remains the
    stateless fallback for non-Japanese or throughput-critical paths."""
    from .functions.jatok import JaSegmentStage

    def step(ds: rd.Dataset) -> rd.Dataset:
        return ds.map_batches(
            JaSegmentStage,
            fn_constructor_kwargs={"text_col": in_col, "out_col": out_col,
                                   "model": model},
            batch_format="pyarrow", concurrency=concurrency, batch_size=batch_size,
        )

    return step


@register_step("extract_turns")
def _extract_turns(batch_size: int | None = None,
                   concurrency: int | tuple[int, int] | None = None,
                   num_buckets: int = 64) -> Step:
    from .pipelines.extract import extract_turns

    def step(ds: rd.Dataset) -> rd.Dataset:
        return extract_turns(ds, batch_size=batch_size, concurrency=concurrency,
                             num_buckets=num_buckets)

    return step
