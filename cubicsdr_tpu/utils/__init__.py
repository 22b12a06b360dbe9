from cubicsdr_tpu.utils.convolve import conv1d, frame_signal  # noqa: F401
