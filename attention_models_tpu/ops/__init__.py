from attention_models_tpu.ops.attention import multihead_attention
from attention_models_tpu.ops.flash_attention import flash_attention
from attention_models_tpu.ops.codebook import nearest_codes, l2_normalize
from attention_models_tpu.ops.moe import topk_gate, moe_linear
from attention_models_tpu.ops.sampling import (
    cosine_schedule,
    filter_logits,
    gumbel_argmax,
)
