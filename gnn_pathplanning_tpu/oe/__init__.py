from .online_expert import OnlineExpert, OnlineExpertConfig, OnlineExpertTrainer, harvest_failures

__all__ = ["OnlineExpert", "OnlineExpertConfig", "OnlineExpertTrainer",
           "harvest_failures"]
