from .rules import RuleConfig, with_rule_flags, score_claims

__all__ = ["RuleConfig", "with_rule_flags", "score_claims"]
