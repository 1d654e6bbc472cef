"""progressivex_tpu.parallel"""
