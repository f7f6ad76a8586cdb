from humanrf_tpu.core.camera import CameraData, read_calibration_csv, write_calibration_csv
from humanrf_tpu.core.aabb import AabbData, read_aabbs_csv, write_aabbs_csv
from humanrf_tpu.core.dataset import VolumetricDataset, VolumetricDatasetFilepaths
