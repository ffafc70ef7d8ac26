"""Equinox-primitive fidelity (VERDICT r2 missing #5).

The stub goldens validate the reference's COMPOSITE math through
gncde_tpu.nn primitives; these tests pin the primitives themselves against
REAL equinox output. The npz files are produced by
``python tools/make_goldens.py`` on any machine where equinox (and diffrax,
for the trajectory) is importable -- drop them into tests/goldens/ and these
tests activate; until then they skip.
"""

import glob
import os

import numpy as np
import pytest
import jax.numpy as jnp
import jax.random as jr

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
HAVE = {os.path.splitext(os.path.basename(p))[0]: p
        for p in glob.glob(os.path.join(GOLDEN_DIR, "*.npz"))}


@pytest.mark.skipif("eqx_linear" not in HAVE,
                    reason="real-equinox golden not committed")
def test_linear_matches_real_equinox():
    from gncde_tpu.nn import Linear

    d = np.load(HAVE["eqx_linear"])
    lin = Linear(8, 5, key=jr.PRNGKey(int(d["key_seed"])))
    np.testing.assert_allclose(np.asarray(lin.weight), d["weight"],
                               rtol=1e-6, atol=0)
    np.testing.assert_allclose(np.asarray(lin.bias), d["bias"],
                               rtol=1e-6, atol=0)
    np.testing.assert_allclose(np.asarray(lin(jnp.asarray(d["x"]))), d["out"],
                               rtol=1e-5, atol=1e-6)


@pytest.mark.skipif("eqx_mlp" not in HAVE,
                    reason="real-equinox golden not committed")
def test_mlp_matches_real_equinox():
    from gncde_tpu.nn import MLP

    d = np.load(HAVE["eqx_mlp"])
    mlp = MLP(in_size=6, out_size=3, width_size=8, depth=2,
              activation="relu", key=jr.PRNGKey(int(d["key_seed"])))
    np.testing.assert_allclose(np.asarray(mlp.layers[0].weight), d["l0_w"],
                               rtol=1e-6, atol=0)
    np.testing.assert_allclose(np.asarray(mlp.layers[0].bias), d["l0_b"],
                               rtol=1e-6, atol=0)
    np.testing.assert_allclose(np.asarray(mlp.layers[-1].weight), d["last_w"],
                               rtol=1e-6, atol=0)
    np.testing.assert_allclose(np.asarray(mlp(jnp.asarray(d["x"]))), d["out"],
                               rtol=1e-5, atol=1e-6)


@pytest.mark.skipif("eqx_rmsnorm" not in HAVE,
                    reason="real-equinox golden not committed")
def test_rmsnorm_matches_real_equinox():
    from gncde_tpu.nn import RMSNorm

    d = np.load(HAVE["eqx_rmsnorm"])
    rms = RMSNorm(8)
    np.testing.assert_allclose(np.asarray(rms.weight), d["weight"])
    np.testing.assert_allclose(np.asarray(rms(jnp.asarray(d["x"]))), d["out"],
                               rtol=1e-5, atol=1e-6)


@pytest.mark.skipif("gncde_trajectory" not in HAVE,
                    reason="diffrax trajectory golden not committed")
def test_full_trajectory_matches_reference():
    """Full GraphNeuralCDE forward (interp -> Tsit5+PID solve -> decode)
    against a reference-executed diffrax trajectory: per-step ys allclose.
    Reference: /root/reference/src/models/graph_neural_cde.py:60-113."""
    from gncde_tpu.models import GraphNeuralCDE
    from gncde_tpu.models.vector_fields import PermEquivGraphVectorField
    from gncde_tpu.interp import backward_hermite_coefficients

    d = np.load(HAVE["gncde_trajectory"])
    n, H = int(d["n"]), int(d["hidden"])
    vf = PermEquivGraphVectorField(
        input_dim=H, hidden_dim=H, output_dim=H, num_layers=2,
        data_embed_dim=1, num_nodes=n, key=jr.PRNGKey(int(d["key_vf"])),
    )
    model = GraphNeuralCDE(
        vf, hidden_dim=H, interpolation="cubic", method="Tsit5",
        return_sequence=True, key=jr.PRNGKey(int(d["key_model"])),
    )
    ts = jnp.asarray(d["ts"])
    A_path = jnp.asarray(d["A_path"])
    tchan = jnp.broadcast_to(ts[:, None, None], A_path.shape)
    X = jnp.stack([tchan, A_path], axis=-1)
    coeffs = backward_hermite_coefficients(ts, X)
    ys = model(ts, coeffs, jnp.asarray(d["x0"]))
    # Adaptive steppers on different backends take slightly different step
    # sequences; trajectory parity is at the solver tolerance, not bitwise.
    np.testing.assert_allclose(np.asarray(ys), d["ys"], rtol=5e-3, atol=5e-4)
