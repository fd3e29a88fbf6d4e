from lina_speech_tpu.train.harness import (
    TrainConfig,
    cosine_schedule_with_warmup,
    create_train_state,
    make_train_step,
    make_eval_step,
)
