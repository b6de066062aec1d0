"""Top-k gated FFN MoE layer (API parity with /root/reference/models/moe.py:14-38).

Gate: Dense(dim → E) WITH bias; top-k selection; combine weights
sigmoid(topk logits); experts are Dense(in → out) WITH bias. The reference's
Python loop + torch.where scatter becomes vectorized dispatch (ops/moe.py):
dense masked-combine for small E, capacity-bucketed gather for large E —
both MXU-shaped, and the stacked expert bank shards over the ``model`` mesh
axis for expert parallelism.

No load-balancing loss and no capacity factor by default, like the reference.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from attention_models_tpu.ops.moe import moe_linear, topk_gate


class MoELayer(nn.Module):
    input_dim: int
    output_dim: int
    num_experts: int
    sel_experts: int
    dtype: jnp.dtype = jnp.float32
    impl: str = "auto"  # "auto" | "dense" | "scatter"
    capacity_factor: float | None = None  # None = dropless

    @nn.compact
    def __call__(self, x):
        gate_logits = nn.Dense(
            self.num_experts, dtype=self.dtype, name="gate"
        )(x)
        weights, selected = topk_gate(gate_logits, self.sel_experts)
        w = self.param(
            "experts_kernel",
            nn.initializers.lecun_normal(),
            (self.num_experts, self.input_dim, self.output_dim),
            jnp.float32,
        )
        b = self.param(
            "experts_bias",
            nn.initializers.zeros,
            (self.num_experts, self.output_dim),
            jnp.float32,
        )
        return moe_linear(
            x, w, selected, weights, b,
            impl=self.impl, capacity_factor=self.capacity_factor,
        )
