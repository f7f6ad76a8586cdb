from humanrf_tpu.data.loader import DataLoader
