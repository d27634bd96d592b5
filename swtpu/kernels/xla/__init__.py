from swtpu.kernels.xla.sw_scan import sw_batch_diag  # noqa: F401
