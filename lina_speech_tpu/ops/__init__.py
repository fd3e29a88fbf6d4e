from lina_speech_tpu.ops.tools import (
    delay_rvq,
    undelay_rvq,
    sequence_mask,
    packmask_2d,
    packed_reset_mask,
    pad_2d_sequence,
)
from lina_speech_tpu.ops.sampling import topk_sampling
from lina_speech_tpu.ops.rotary import RotaryEmbedding, apply_rotary
from lina_speech_tpu.ops.gla import (
    gla_scan_ref,
    gla_chunk,
    gla_decode_step,
)
from lina_speech_tpu.ops.short_conv import (
    causal_depthwise_conv,
    short_conv_step,
)
from lina_speech_tpu.ops.rwkv6 import (
    rwkv6_chunk,
    rwkv6_decode_step,
    rwkv6_scan_ref,
)
from lina_speech_tpu.ops.mamba import selective_scan, selective_step
from lina_speech_tpu.ops.gla_cp import gla_chunk_cp, rwkv6_chunk_cp
from lina_speech_tpu.ops.mamba_cp import selective_scan_cp
