from cspn_monodepth_tpu.models.resnet import ResNetEncoder
from cspn_monodepth_tpu.models.unet import UpProjDecoder
from cspn_monodepth_tpu.models.cspn_net import CSPNDepthNet

__all__ = ["ResNetEncoder", "UpProjDecoder", "CSPNDepthNet"]
