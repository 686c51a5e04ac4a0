from gsasr_tpu.data.matlab_resize import imresize, imresize_new

__all__ = ["imresize", "imresize_new"]
