"""Chunked test-set evaluation aggregates exactly (SmokePipeline.evaluate).

The fused sample->solve->metrics program's HBM footprint scales with the
test batch (24 GB at B=50 vs the chip's 15.75 GB, measured by AOT compile
in round 3), so `evaluate` runs the test set in `eval_chunk`-sized pieces.
Every metric in evaluate_samples (tasks/smoke/metrics.py, reference:
2d/inference_2d.py:471-507) is a per-sample or per-sample-x-frame mean with
equal frame counts, so the length-weighted mean over chunks must equal the
whole-batch value bit-for-bit in exact arithmetic.
"""
import numpy as np
import jax.numpy as jnp

from safediffcon_tpu.tasks.smoke.data import SmokeDataset
from safediffcon_tpu.tasks.smoke.pipeline import SmokePipeline


class _Cfg:
    use_guidance = True


def _bare_pipeline(eval_chunk):
    # aggregation-only instance: no model/solver construction
    pipe = SmokePipeline.__new__(SmokePipeline)
    pipe.ccfg = _Cfg()
    pipe.eval_chunk = eval_chunk
    calls = []

    def fake_evaluate(params, rng, raw, Q, guided=True):
        calls.append(int(raw.shape[0]))
        x = raw[:, 0, 0, 0, 0]
        return {"mean_metric": jnp.mean(x), "frac_metric": jnp.mean(x > 3.0)}

    pipe._evaluate = fake_evaluate
    return pipe, calls


def _data(n):
    raw = np.zeros((n, 2, 2, 2, 7), np.float32)
    raw[:, 0, 0, 0, 0] = np.arange(n, dtype=np.float32)
    return SmokeDataset(data=raw, raw=raw)


def test_chunked_matches_whole_batch_even_and_ragged():
    import jax

    data = _data(7)
    x = data.raw[:, 0, 0, 0, 0]
    expect = {"mean_metric": float(x.mean()),
              "frac_metric": float((x > 3.0).mean())}

    for chunk in (None, 7, 3, 2, 1):  # 3 and 2 exercise ragged last chunks
        pipe, calls = _bare_pipeline(chunk)
        out = pipe.evaluate({}, data, 0.0, jax.random.PRNGKey(0))
        np.testing.assert_allclose(
            [out[k] for k in sorted(expect)],
            [expect[k] for k in sorted(expect)], rtol=1e-6,
            err_msg=f"chunk={chunk}")
        assert sum(calls) == 7
        if chunk:
            assert all(c <= chunk for c in calls)
