"""utils/hostmath: local-CPU routing for host-facing micro-math.

On the CPU test backend ``host_device()`` must be a no-op (None) so the
oracled numerics are untouched; with a forced CPU device the wrapped math
must stay bitwise-identical and actually land on the requested device.
"""

import jax
import jax.numpy as jnp
import numpy as np

from video_gen_evals_tpu.data.features import compute_modality_diffs
from video_gen_evals_tpu.utils import hostmath


def test_host_device_is_noop_on_cpu_backend():
    assert jax.default_backend() == "cpu"
    assert hostmath.host_device() is None


def test_host_math_context_noop_matches_plain():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(12, 32)).astype(np.float32)
    with hostmath.host_math():
        inside = np.asarray(jnp.tanh(jnp.asarray(x)))
    outside = np.asarray(jnp.tanh(jnp.asarray(x)))
    np.testing.assert_array_equal(inside, outside)


def test_forced_cpu_device_bitwise_and_placement(monkeypatch):
    """Simulate the remote-default case: host_device() returns a concrete
    CPU device; wrapped ops must execute there with unchanged results."""
    dev = jax.devices("cpu")[0]
    monkeypatch.setattr(hostmath, "host_device", lambda: dev)

    rng = np.random.default_rng(1)
    arrays = {
        "vit": rng.normal(size=(10, 16)).astype(np.float32),
        "beta": rng.normal(size=(10, 10)).astype(np.float32),
        "kp2d": rng.uniform(size=(10, 120)).astype(np.float32),
    }
    plain = compute_modality_diffs(arrays)

    with hostmath.host_math():
        y = jnp.asarray(arrays["vit"]) * 2.0
        assert next(iter(y.devices())) == dev

    wrapped = compute_modality_diffs(arrays)
    assert set(plain) == set(wrapped)
    for m in plain:
        np.testing.assert_array_equal(plain[m], wrapped[m])
