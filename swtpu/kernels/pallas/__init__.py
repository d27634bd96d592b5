from swtpu.kernels.pallas.sw_batch import sw_batch_pallas  # noqa: F401
