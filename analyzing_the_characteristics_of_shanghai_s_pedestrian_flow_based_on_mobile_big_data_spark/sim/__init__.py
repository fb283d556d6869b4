from .siar import (  # noqa: F401
    DEFAULT_SUSC,
    confirmation_curve,
    fit_siar,
    move,
    move_banded,
    rmse_confirmed_loss,
    siar_banded_step,
    siar_step,
    simulate,
    simulate_banded,
    spark_param_sweep,
)
