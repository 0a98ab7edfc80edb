from dqmc_tpu.run import main

main()
