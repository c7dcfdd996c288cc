from clsurvey_tpu.utils import config, io, paths, rng, timing  # noqa: F401
