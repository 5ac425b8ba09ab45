from .dataset import YOLODataset, DataLoader  # noqa: F401
from .preprocess import letterbox, preprocess_batch  # noqa: F401
