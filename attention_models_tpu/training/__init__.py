from attention_models_tpu.training.build_trainer import build_trainer
from attention_models_tpu.training.base_trainer import BaseTrainer
from attention_models_tpu.training.vqgan_trainer import VQGANTrainer
from attention_models_tpu.training.vit_trainer import VitTrainer
from attention_models_tpu.training.generator_trainers import (
    MaskGitTrainer,
    MuseTrainer,
    PartiTrainer,
)
