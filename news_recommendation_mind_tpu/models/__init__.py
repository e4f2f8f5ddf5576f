from .attention import MultiheadAttention, make_attn_mask, scaled_dp_attention
from .embeddings import WordEmbedding
from .news_encoders import (
    CnnNewsEncoder,
    MhaNewsEncoder,
    RnnNewsEncoder,
    TransformerNewsEncoder,
    make_news_encoder,
)
from .user_encoders import (
    AttentionPooling,
    AveragePooling,
    LsturUserEncoder,
    MhaUserEncoder,
    RnnUserEncoder,
    make_user_encoder,
)
from .two_tower import TwoTower, train_loss

__all__ = [
    "MultiheadAttention",
    "make_attn_mask",
    "scaled_dp_attention",
    "WordEmbedding",
    "CnnNewsEncoder",
    "MhaNewsEncoder",
    "RnnNewsEncoder",
    "TransformerNewsEncoder",
    "make_news_encoder",
    "AttentionPooling",
    "AveragePooling",
    "LsturUserEncoder",
    "MhaUserEncoder",
    "RnnUserEncoder",
    "make_user_encoder",
    "TwoTower",
    "train_loss",
]
