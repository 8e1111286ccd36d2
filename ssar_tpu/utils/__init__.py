from .platform import on_tpu, pallas_interpret
