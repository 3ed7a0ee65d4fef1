from pegasus_tpu.training.trainer import GSTrainer, TrainConfig, TrainState
