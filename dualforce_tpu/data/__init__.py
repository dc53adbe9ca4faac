from dualforce_tpu.data.dataset import VideoAudioDataset, make_data_iter  # noqa: F401
