from lina_speech_tpu.utils.checkpoint import (
    save_checkpoint,
    restore_checkpoint,
    convert_torch_lina,
    torch_key_for,
)
