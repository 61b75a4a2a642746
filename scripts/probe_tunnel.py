"""Tiny axon-tunnel health probe (round-3 wedge playbook, CLAUDE.md).

Exits 0 and prints one line if a trivial device_get returns; run under
`timeout` — rc=124 means the tunnel is wedged/unreachable.
"""
import time

import jax

jax.config.update("jax_platforms", "axon")
import jax.numpy as jnp  # noqa: E402

t0 = time.time()
v = float(jax.device_get(jnp.sum(jnp.ones((8, 8)))))
print(f"tunnel ok: sum={v}, devices={jax.devices()}, {time.time()-t0:.1f}s")
