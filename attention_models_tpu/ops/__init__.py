from attention_models_tpu.ops.attention import multihead_attention
# NOTE: the flash_attention FUNCTION is not re-exported here — binding it on
# the package would shadow the ops.flash_attention SUBMODULE attribute
# (breaking `import attention_models_tpu.ops.flash_attention as fa`). Import
# it from the submodule directly.
from attention_models_tpu.ops.codebook import nearest_codes, l2_normalize
from attention_models_tpu.ops.moe import topk_gate, moe_linear, moe_linear_ep
from attention_models_tpu.ops.ring_attention import ring_flash_attention
from attention_models_tpu.ops.sampling import (
    cosine_schedule,
    filter_logits,
    gumbel_argmax,
)
