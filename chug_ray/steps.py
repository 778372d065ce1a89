"""User-extension surface: Step protocol, pipeline compiler, task registry.

Mirrors the reference's extension model (SURVEY.md §2.10) Ray-Data-first:

* a task pipeline there is a plain list of callables inserted into the
  wds pipeline (`/root/reference/src/chug/wds/pipeline.py:50-52,105-106`);
  here it is an ordered list of :class:`Step` compiled to chained
  ``map_batches`` over a ``ray.data.Dataset``.
* the cfg-type → builder factory
  (`/root/reference/src/chug/task_pipeline/pipeline_factory.py:9-19`)
  becomes :func:`register_task` / :func:`build_task_pipeline`, keyed by
  the task-config dataclass type.
* stateless steps run as Ray tasks; a Step whose ``fn`` is a class runs
  as an actor pool (state built once per actor in ``__init__``).
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import Any, Callable


@dataclass(frozen=True)
class Step:
    """One pipeline stage: a batch UDF (function → task pool, class →
    actor pool) plus its execution parameters."""

    name: str
    fn: Callable | type
    batch_size: int | None = None
    concurrency: int | tuple[int, int] | None = None
    num_cpus: float | None = None
    batch_format: str = "pyarrow"
    fn_constructor_args: tuple = field(default_factory=tuple)

    @property
    def is_actor(self) -> bool:
        return inspect.isclass(self.fn)

    def __post_init__(self):
        if self.fn_constructor_args and not inspect.isclass(self.fn):
            raise ValueError(
                f"step {self.name!r}: fn_constructor_args only apply to "
                "a callable CLASS (actor) step — a plain function would "
                "silently ignore them; use functools.partial instead"
            )


def compile_pipeline(ds, steps: list[Step]):
    """Chain the steps onto a Dataset (lazy; streaming executor runs it)."""
    for step in steps:
        kwargs: dict[str, Any] = {"batch_format": step.batch_format}
        if step.batch_size is not None:
            kwargs["batch_size"] = step.batch_size
        if step.num_cpus is not None:
            kwargs["num_cpus"] = step.num_cpus
        if step.is_actor:
            kwargs["concurrency"] = step.concurrency or (1, 4)
            kwargs["fn_constructor_args"] = step.fn_constructor_args
        elif step.concurrency is not None:
            kwargs["concurrency"] = step.concurrency
        ds = ds.map_batches(step.fn, **kwargs)
    return ds


# ---------------------------------------------------------------------------
# task registry (cfg dataclass type → list-of-Steps builder)
# ---------------------------------------------------------------------------

_TASK_REGISTRY: dict[type, Callable[[Any], list[Step]]] = {}


def register_task(cfg_type: type):
    """Decorator: register a Step-list builder for a task-config type."""

    def deco(builder: Callable[[Any], list[Step]]):
        _TASK_REGISTRY[cfg_type] = builder
        return builder

    return deco


def build_task_pipeline(cfg: Any) -> list[Step]:
    """Dispatch on the config's type, like the reference factory raising
    on unknown cfg (`pipeline_factory.py:17-19`)."""
    builder = _TASK_REGISTRY.get(type(cfg))
    if builder is None:
        raise ValueError(
            f"no task pipeline registered for config type {type(cfg).__name__}"
        )
    return builder(cfg)


# ---------------------------------------------------------------------------
# built-in tasks
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ManualTaskCfg:
    """Run exactly one user-supplied batch callable — the analog of the
    reference's manual pipeline that wraps a single user fn
    (`/root/reference/src/chug/task_pipeline/pipeline_manual.py:16-27`)."""

    fn: Callable
    batch_size: int | None = None
    batch_format: str = "pyarrow"


@register_task(ManualTaskCfg)
def _build_manual(cfg: ManualTaskCfg) -> list[Step]:
    return [
        Step(
            name="manual",
            fn=cfg.fn,
            batch_size=cfg.batch_size,
            batch_format=cfg.batch_format,
        )
    ]
