from .routing import status_expr, is_valid_expr, dlq_error_reason_expr

__all__ = ["status_expr", "is_valid_expr", "dlq_error_reason_expr"]
