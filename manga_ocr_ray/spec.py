"""Typed pipeline-spec loading: YAML file → validated steps → Dataset run.

The reference's only typed schema system is its pydantic YAML+env training
config (/root/reference/manga_ocr_dev/training/config/schemas.py:21-160,
loader at config/__init__.py).  This is the engine's analog for DATA
pipelines: a spec file declares input, registry steps and output; loading
validates everything a cluster run would otherwise discover mid-flight —
unknown ops, unknown/missing step params, bad types — plus ``${ENV_VAR}``
interpolation like the reference's env overlay.

Example spec::

    input:
      path: /data/documents.parquet   # or ${DOCS_PATH}
      columns: [doc_id, text]
    steps:
      - op: strip_html
        out_col: stripped_text
      - op: normalize
        in_col: stripped_text
        out_col: clean_text
      - op: select
        columns: [doc_id, clean_text]
    output:
      path: /out/clean                # optional; omit to return the Dataset

Run with ``python -m manga_ocr_ray run --spec pipeline.yaml``.
"""

from __future__ import annotations

import inspect
import os
import re

from pydantic import BaseModel, ConfigDict, field_validator

import ray.data as rd

from .registry import STEP_REGISTRY, build_pipeline

_ENV_RE = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)\}")


def _interp(value):
    """Recursive ``${VAR}`` environment interpolation (missing vars raise)."""
    if isinstance(value, str):
        def sub(m: re.Match) -> str:
            name = m.group(1)
            if name not in os.environ:
                raise ValueError(f"spec references undefined env var ${{{name}}}")
            return os.environ[name]
        return _ENV_RE.sub(sub, value)
    if isinstance(value, list):
        return [_interp(v) for v in value]
    if isinstance(value, dict):
        return {k: _interp(v) for k, v in value.items()}
    return value


class InputSpec(BaseModel):
    model_config = ConfigDict(extra="forbid")

    path: str
    columns: list[str] | None = None


class StepSpec(BaseModel):
    model_config = ConfigDict(extra="allow")  # extra keys are the op's params

    op: str

    @field_validator("op")
    @classmethod
    def _known_op(cls, v: str) -> str:
        if v not in STEP_REGISTRY:
            raise ValueError(
                f"unknown pipeline op {v!r}; registered: {sorted(STEP_REGISTRY)}")
        return v

    def params(self) -> dict:
        return {k: v for k, v in self.model_dump().items() if k != "op"}


class OutputSpec(BaseModel):
    model_config = ConfigDict(extra="forbid")

    path: str
    min_rows_per_file: int | None = None


class PipelineSpec(BaseModel):
    model_config = ConfigDict(extra="forbid")

    input: InputSpec
    steps: list[StepSpec]
    output: OutputSpec | None = None

    def validate_steps(self) -> None:
        """Check every step's params against the registered factory signature
        BEFORE anything touches the cluster (unknown/missing params raise at
        load, not inside a Ray task)."""
        for i, step in enumerate(self.steps):
            factory = STEP_REGISTRY[step.op]
            sig = inspect.signature(factory)
            names = set(sig.parameters)
            has_kwargs = any(p.kind is inspect.Parameter.VAR_KEYWORD
                             for p in sig.parameters.values())
            params = step.params()
            unknown = set(params) - names
            if unknown and not has_kwargs:
                raise ValueError(
                    f"step {i} ({step.op}): unknown params {sorted(unknown)}; "
                    f"accepted: {sorted(names)}")
            missing = [n for n, p in sig.parameters.items()
                       if p.default is inspect.Parameter.empty
                       and p.kind in (inspect.Parameter.POSITIONAL_OR_KEYWORD,
                                      inspect.Parameter.KEYWORD_ONLY)
                       and n not in params]
            if missing:
                raise ValueError(
                    f"step {i} ({step.op}): missing required params {missing}")


def load_spec(path: str) -> PipelineSpec:
    """Parse + env-interpolate + validate a YAML pipeline spec."""
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f)
    if not isinstance(raw, dict):
        raise ValueError(f"spec {path} must be a YAML mapping, got {type(raw).__name__}")
    spec = PipelineSpec.model_validate(_interp(raw))
    spec.validate_steps()
    return spec


def run_spec(spec: PipelineSpec) -> rd.Dataset | dict:
    """Execute a validated spec: pruned parquet read → compiled registry steps
    → optional partitioned parquet write (returns the lazy Dataset when the
    spec has no output, write stats when it does)."""
    ds = rd.read_parquet(spec.input.path, columns=spec.input.columns)
    pipe = build_pipeline([{"op": s.op, **s.params()} for s in spec.steps])
    out = pipe(ds)
    if spec.output is None:
        return out
    kwargs = {}
    if spec.output.min_rows_per_file:
        kwargs["min_rows_per_file"] = spec.output.min_rows_per_file
    out.write_parquet(spec.output.path, **kwargs)
    # no count() here — that would re-execute the whole pipeline
    return {"path": spec.output.path}
