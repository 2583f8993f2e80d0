from .pipeline import decode_orders, route_orders, run_order_pipeline

__all__ = ["decode_orders", "route_orders", "run_order_pipeline"]
