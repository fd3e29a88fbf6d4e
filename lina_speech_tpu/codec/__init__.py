from lina_speech_tpu.codec.vocos import VocosBackbone, ConvNeXtBlock
from lina_speech_tpu.codec.heads import ISTFTHead
from lina_speech_tpu.codec.spectral import istft_same
from lina_speech_tpu.codec.seanet import SEANetEncoder
from lina_speech_tpu.codec.vq import VectorQuantizer, vq_encode, vq_decode
from lina_speech_tpu.codec.wavtokenizer import WavTokenizer, WavTokenizerConfig
