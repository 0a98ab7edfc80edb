from dqmc_tpu.io.h5out import BinFileWriter

__all__ = ["BinFileWriter"]
