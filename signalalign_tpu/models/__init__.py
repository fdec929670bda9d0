from signalalign_tpu.models.pore_model import PoreModel  # noqa: F401
