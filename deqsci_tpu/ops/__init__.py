from deqsci_tpu.ops.sensing import A, At, phi_sum, initial_point, initial_point_admm

__all__ = ["A", "At", "phi_sum", "initial_point", "initial_point_admm"]
