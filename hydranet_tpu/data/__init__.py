from hydranet_tpu.data.dataset import MultitaskDataset  # noqa: F401
from hydranet_tpu.data.loader import DataLoader  # noqa: F401
