from lina_speech_tpu.models.base_blocks import MixingBlock, SwiGLU, SelfAttention
from lina_speech_tpu.models.multiembed import MultiEmbedding
from lina_speech_tpu.models.crossatt import (
    CrossAttention,
    BlindCrossAttention,
    CrossAttentionPP,
    SinPos,
    ConvPos,
)
from lina_speech_tpu.models.gla_layer import GatedLinearAttention, GLAState
from lina_speech_tpu.models.encoder import TextEncoder, SimpleSpeakerEncoder
from lina_speech_tpu.models.attentive_rnn import AttentiveGLA
from lina_speech_tpu.models.lina import LinaModel
