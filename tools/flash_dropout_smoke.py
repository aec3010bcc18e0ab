"""On-chip smoke for in-kernel flash-attention dropout (fwd + bwd).

The dropout mask is a deterministic counter-hash regenerated inside the
backward kernel (never materialised in HBM); the CPU suite pins its
numerics in interpret mode (tests/test_flash_attention.py), and this
script confirms the same kernels compile and run on the real TPU —
including the MQA head-broadcast layout (4 query heads over 1 KV head).

Run via tools/measure_queue.sh; prints FLASH_DROPOUT_ONCHIP_OK on
success.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from image2text_tpu.ops.flash_attention import flash_sdpa

q = jnp.asarray(np.random.default_rng(0).standard_normal((2, 4, 256, 128)),
                jnp.bfloat16)
k = jnp.asarray(np.random.default_rng(1).standard_normal((2, 1, 320, 128)),
                jnp.bfloat16)
v = jnp.asarray(np.random.default_rng(2).standard_normal((2, 1, 320, 128)),
                jnp.bfloat16)
seed = jnp.asarray(42, jnp.int32)

out = flash_sdpa(q, k, v, None, True, 0.1, seed)
print("fwd ok", np.asarray(out).shape,
      float(jnp.abs(out.astype(jnp.float32)).mean()))
g = jax.grad(
    lambda q, k, v: jnp.sum(
        flash_sdpa(q, k, v, None, True, 0.1, seed).astype(jnp.float32)),
    argnums=(0, 1, 2))(q, k, v)
print("bwd ok", [float(jnp.abs(x.astype(jnp.float32)).mean()) for x in g])
print("FLASH_DROPOUT_ONCHIP_OK")
