from rapiddoc_tpu.models.cli import main

main("table")
