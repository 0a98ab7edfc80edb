from dqmc_tpu.analysis.jackknife import jackknife, jackknife_array
from dqmc_tpu.analysis.cli import analyze, main

__all__ = ["jackknife", "jackknife_array", "analyze", "main"]
