from .online_expert import (GenPool, OnlineExpert, OnlineExpertConfig,
                            OnlineExpertTrainer, harvest_failures)

__all__ = ["GenPool", "OnlineExpert", "OnlineExpertConfig",
           "OnlineExpertTrainer", "harvest_failures"]
