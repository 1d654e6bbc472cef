from progressivex_tpu.eval.adelaide import (  # noqa: F401
    H_PROTOCOL,
    F_PROTOCOL,
    discover_scenes,
    download_adelaide,
    evaluate_scenes,
    throughput_batch,
)
