from .data import WindowDataset, overlapping_slices, prefetch, synthetic_dataset, train_val_split
from .losses import (
    audio_reactive_loss,
    normalize_gradients,
    orthogonal_procrustes_distance,
    supervised_loss,
)
