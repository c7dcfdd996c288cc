from clsurvey_tpu.models.registry import (  # noqa: F401
    parse_model_name,
    ModelSpec,
    create_init_model,
)
from clsurvey_tpu.models import heads  # noqa: F401
