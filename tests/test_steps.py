"""Step protocol / pipeline compiler / task registry (§2.10) and the
named error-handler aliases (§2.9)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from chug_ray.errors import HANDLER_ALIASES, normalize_policy
from chug_ray.steps import (
    ManualTaskCfg,
    Step,
    build_task_pipeline,
    compile_pipeline,
    register_task,
)


# NOTE: UDFs are defined inside the tests (closures) so cloudpickle
# ships them by value — module-level defs in a test module pickle by
# reference to a module Ray workers cannot import.


def _make_udfs():
    def double(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.schema.get_field_index("x"),
            "x",
            pc.multiply(batch["x"], pa.scalar(2)),
        )

    class AddN:
        """Actor step: state (the increment) built once per actor."""

        def __init__(self, n: int):
            self.n = n

        def __call__(self, batch: pa.Table) -> pa.Table:
            return batch.set_column(
                batch.schema.get_field_index("x"),
                "x",
                pc.add(batch["x"], pa.scalar(self.n)),
            )

    return double, AddN


def test_compile_chains_fn_and_actor_steps(ray_session):
    import ray.data

    double, AddN = _make_udfs()
    ds = ray.data.from_arrow(pa.table({"x": list(range(10))}))
    out = compile_pipeline(
        ds,
        [
            Step(name="double", fn=double),
            Step(
                name="add",
                fn=AddN,
                fn_constructor_args=(100,),
                concurrency=(1, 2),
                batch_size=4,
            ),
        ],
    )
    vals = sorted(r["x"] for r in out.take_all())
    assert vals == [2 * i + 100 for i in range(10)]


def test_registry_dispatch_and_unknown_cfg(ray_session):
    import ray.data

    double, _ = _make_udfs()
    steps = build_task_pipeline(ManualTaskCfg(fn=double))
    assert [s.name for s in steps] == ["manual"]
    ds = ray.data.from_arrow(pa.table({"x": [3]}))
    assert compile_pipeline(ds, steps).take_all()[0]["x"] == 6

    with pytest.raises(ValueError, match="no task pipeline registered"):
        build_task_pipeline(object())


def test_register_task_decorator():
    class MyCfg:
        pass

    @register_task(MyCfg)
    def builder(cfg):
        return [Step(name="noop", fn=lambda b: b)]

    assert [s.name for s in build_task_pipeline(MyCfg())] == ["noop"]


def test_handler_aliases_resolve():
    assert normalize_policy("log_and_continue") == "skip"
    assert normalize_policy("warn_and_continue") == "skip"
    assert normalize_policy("reraise_exception") == "raise"
    assert normalize_policy("ignore_and_stop") == "raise"
    with pytest.raises(ValueError, match="unknown error_policy"):
        normalize_policy("explode")
    # every alias resolves to a base policy that is itself an alias
    for name in HANDLER_ALIASES:
        assert normalize_policy(name) in ("skip", "raise")


def test_pipeline_accepts_reference_handler_name(ray_session):
    import ray.data

    from chug_ray.config import ExtractConfig
    from chug_ray.pipeline import build_extract_pipeline
    from chug_ray.schema import DOC_SCHEMA

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(["d0"], pa.string()),
                "spans": pa.array(
                    [[{"kind": "text", "text": "hi", "media_ref": "", "offset": 0}]],
                    DOC_SCHEMA.field("spans").type,
                ),
            }
        )
    )
    out = build_extract_pipeline(
        docs, ExtractConfig(error_policy="log_and_continue")
    ).take_all()
    assert len(out) == 1 and out[0]["err"] is None
