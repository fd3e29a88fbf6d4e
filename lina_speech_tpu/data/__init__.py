from lina_speech_tpu.data.tokenizer import TextTokenizer, ByteTokenizer
from lina_speech_tpu.data.collate import collate_tts, packed_collate_tts
from lina_speech_tpu.data.synthetic import synthetic_tts_batches
