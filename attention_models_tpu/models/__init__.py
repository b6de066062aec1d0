from attention_models_tpu.models.attention import (
    AgentAttention,
    SoftmaxAttention,
    SwitchHeadAttention,
)
from attention_models_tpu.models.layers import (
    AbsolutePositionalEmbedding,
    FeedForward,
    GammaLayerNorm,
    LayerNorm,
    Mlp,
    SinusoidalPositionalEncoding,
)
from attention_models_tpu.models.moe import MoELayer
from attention_models_tpu.models.transformer import (
    Decoder,
    DecoderLayer,
    Encoder,
    EncoderLayer,
    Transformer,
)
from attention_models_tpu.models.vit import ViT
from attention_models_tpu.models.vit_moe import ViTMoE
from attention_models_tpu.models.vitvqgan import Codebook, ViTVQGAN, vitvqgan_base
from attention_models_tpu.models.vqgan import VQGAN, CodebookCNN
from attention_models_tpu.models.discriminator import NLayerDiscriminator
