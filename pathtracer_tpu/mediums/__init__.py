from pathtracer_tpu.mediums.tables import Mediums, MED_HG, MED_RAYLEIGH

__all__ = ["Mediums", "MED_HG", "MED_RAYLEIGH"]
