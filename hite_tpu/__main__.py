from hite_tpu.pipeline.run import main

main()
