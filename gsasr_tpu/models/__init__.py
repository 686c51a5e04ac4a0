from gsasr_tpu.models.edsr import EDSRNOUP
from gsasr_tpu.models.fea2gs import Fea2GS
from gsasr_tpu.models.fea2gs_rope import Fea2GSRopeAMP
from gsasr_tpu.models.hat import HATNOUP
from gsasr_tpu.models.rdn import RDNNOUP
from gsasr_tpu.models.swinir import SwinIRNOUP

__all__ = ["EDSRNOUP", "Fea2GS", "Fea2GSRopeAMP", "HATNOUP", "RDNNOUP",
           "SwinIRNOUP"]
