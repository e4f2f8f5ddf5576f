"""Example class-based configuration (counterpart of the reference's
data/configs/demo.py, consumed via utils/Manager.py:38-42's config-object
path). Any object with Config-named attributes works:

    from news_recommendation_mind_tpu.config import config_from_object
    from configs.demo import DemoConfig
    cfg = config_from_object(DemoConfig())
"""


class DemoConfig:
    def __init__(self):
        self.scale = "synthetic"
        self.mode = "train"
        self.model = "twotower"
        self.embedding = "random"
        self.encoderN = "cnn"
        self.encoderU = "lstm"
        self.epochs = 2
        self.batch_size = 32
        self.his_size = 50
        self.signal_length = 30
        self.hidden_dim = 150
        self.embedding_dim = 768
        self.npratio = 4
        self.lr = 1e-4
        self.bert_lr = 6e-6
        self.dropout_p = 0.2
        self.head_num = 12
        self.seed = 42
        self.metrics = "auc,mean_mrr,ndcg@5;10"
        self.fast = True
        self.dtype = "bfloat16"
