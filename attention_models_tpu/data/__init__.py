from attention_models_tpu.data.loaders import build_loader, DataLoader
from attention_models_tpu.data.transforms import get_transform
