from .cholesky import (
    masked_gram_noise,
    masked_cholesky,
    cho_solve_lower,
    masked_logdet,
    givens_delete_rows,
    chol_continue,
)

__all__ = [
    "masked_gram_noise",
    "masked_cholesky",
    "cho_solve_lower",
    "masked_logdet",
    "givens_delete_rows",
    "chol_continue",
]
