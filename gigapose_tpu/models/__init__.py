from gigapose_tpu.models.vit import ViT, VIT_CONFIGS
from gigapose_tpu.models.ae_net import AENet
from gigapose_tpu.models.ist_net import ISTNet, ISTBackbone, Regressor
from gigapose_tpu.models.losses import (
    info_nce_loss,
    scale_loss,
    inplane_loss,
    pairwise_cosine,
)
