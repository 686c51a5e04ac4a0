from gsasr_tpu.models.classic import EDSR, HAT, RDN, SwinIR
from gsasr_tpu.models.edsr import EDSRNOUP
from gsasr_tpu.models.fea2gs import Fea2GS
from gsasr_tpu.models.fea2gs_rope import Fea2GSRopeAMP
from gsasr_tpu.models.hat import HATNOUP
from gsasr_tpu.models.hat_paper import HATNOUPPaper
from gsasr_tpu.models.rdn import RDNNOUP
from gsasr_tpu.models.swinir import SwinIRNOUP
from gsasr_tpu.models.init import init_with_torch_defaults, torch_init

__all__ = ["EDSR", "EDSRNOUP", "Fea2GS", "Fea2GSRopeAMP", "HAT", "HATNOUP",
           "HATNOUPPaper", "RDN", "RDNNOUP", "SwinIR", "SwinIRNOUP",
           "init_with_torch_defaults", "torch_init"]
