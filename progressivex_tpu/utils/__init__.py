"""progressivex_tpu.utils"""
