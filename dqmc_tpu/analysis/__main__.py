from dqmc_tpu.analysis.cli import main

main()
