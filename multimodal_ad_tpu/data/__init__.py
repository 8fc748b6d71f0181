"""Data layer exports."""

from .adni import ADNIManifest, TASK_GROUPS
from .device_cache import (DeviceDataset, DeviceEpochIterator,
                           build_device_dataset)
from .pipeline import VolumeBatcher, device_prefetch, load_volume
from .splits import stratified_kfold, stratified_test_split
from .tabular import (load_adni_data_binary, load_adni_data_quadclass,
                      load_adni_data_triclass, load_adni_table)
from .transforms import (VolumeTransform, adaptive_normal, make_transforms,
                         scale_intensity)

__all__ = [
    "ADNIManifest", "TASK_GROUPS", "VolumeBatcher", "device_prefetch",
    "load_volume", "DeviceDataset", "DeviceEpochIterator",
    "build_device_dataset", "stratified_kfold", "stratified_test_split",
    "load_adni_data_binary", "load_adni_data_triclass",
    "load_adni_data_quadclass", "load_adni_table", "VolumeTransform",
    "adaptive_normal", "scale_intensity", "make_transforms",
]
