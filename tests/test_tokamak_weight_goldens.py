"""Golden parity of the tokamak conformal weight path vs the reference
implementation (default suite — cheap elementwise math, no sampling)."""
import pytest


def test_tokamak_weights_match_reference_goldens():
    """Audit (VERDICT r2 item 4): our tokamak weight path vs the ACTUAL
    reference calculate_weight/normalize_weights run on a shared fixture
    (golden generated from /root/reference/tokamak/utils/guidance.py:98-141;
    fixture layout transposed — reference is (B, C, T), ours (B, T, C)).
    Covers the single factor, the posttrain squared-train composite, the
    test-mode finetune composite, and sum=n weight normalization."""
    import os

    import numpy as np
    import jax.numpy as jnp

    from safediffcon_tpu.core.conformal import normalize_weights
    from safediffcon_tpu.tasks.tokamak.task import TokamakTaskConfig, shift_weights

    g = np.load(os.path.join(os.path.dirname(__file__), "golden",
                             "tokamak_weights_reference.npz"))
    x = jnp.asarray(g["x"].transpose(0, 2, 1))       # (B, T, C)
    tgt = jnp.asarray(g["tgt"].transpose(0, 2, 1))   # (B, nt, 3)
    Q, Q_ft = float(g["Q"]), float(g["Q_ft"])

    cfg = TokamakTaskConfig(w_obj=0.5, w_safe=0.5, guidance_scaler=5.0)
    w = shift_weights(x, tgt, Q, cfg)
    np.testing.assert_allclose(np.asarray(w), g["w_single"], rtol=2e-5)

    # posttrain (finetune_set='train', use_guidance): factor squared
    np.testing.assert_allclose(np.asarray(w * w), g["w_train_squared"],
                               rtol=2e-5)

    # test-mode composite: train factor x finetune-config factor
    cfg_ft = TokamakTaskConfig(w_obj=0.4, w_safe=0.6, guidance_scaler=0.01)
    w_ft = shift_weights(x, tgt, Q_ft, cfg_ft)
    np.testing.assert_allclose(np.asarray(w * w_ft), g["w_test_composite"],
                               rtol=2e-5)

    wn = normalize_weights(w * w)
    np.testing.assert_allclose(np.asarray(wn),
                               g["w_train_squared_normalized"], rtol=2e-5)
