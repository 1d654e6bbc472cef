"""progressivex_tpu.core"""
