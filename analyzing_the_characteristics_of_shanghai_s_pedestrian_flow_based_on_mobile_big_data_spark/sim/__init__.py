from .siar import (  # noqa: F401
    move,
    siar_step,
    simulate,
    spark_param_sweep,
)
