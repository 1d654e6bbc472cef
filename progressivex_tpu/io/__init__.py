"""progressivex_tpu.io"""
