"""Local-CPU execution for tiny host-facing math.

A handful of pipeline steps run micro-sized jnp programs on host-resident
numpy data and immediately fetch the result back (per-video diff features,
final per-video TC/AC reductions). The arithmetic is microseconds, but when
the default backend is a remote TPU behind the axon tunnel each step costs
two blocking round-trips (~28 ms each: a ``device_put`` and a fetch) — per
modality, per video. Measured on the config-4 bench this idle tunnel time
was ~25-30% of steady-state wall clock.

:func:`host_math` routes such steps to the local CPU backend (present in
every process: the axon sitecustomize pins ``jax_platforms=axon,cpu``).
When the default backend is already the CPU (tests, pure-CPU runs) it is a
no-op, so the oracled numerics — all defined on the CPU backend — are
byte-identical with or without it.

This is for HOST-FACING micro-math only: anything batched or hot stays on
the accelerator; never wrap device-resident pipelines in it.
"""

from __future__ import annotations

import contextlib

import jax


def host_device():
    """The local CPU device when the default backend is remote, else None."""
    if jax.default_backend() == "cpu":
        return None  # already local: leave placement alone
    try:
        return jax.local_devices(backend="cpu")[0]
    except RuntimeError:  # no CPU backend registered
        return None


@contextlib.contextmanager
def host_math():
    """Context: run tiny host-facing jnp math on the local CPU backend."""
    dev = host_device()
    if dev is None:
        yield
    else:
        with jax.default_device(dev):
            yield
