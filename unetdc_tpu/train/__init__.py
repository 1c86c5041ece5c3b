from unetdc_tpu.train.trainer import Trainer, TrainConfig  # noqa: F401
