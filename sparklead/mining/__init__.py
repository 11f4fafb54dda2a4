from sparklead.mining.drain import DrainMiner, parse_drain
from sparklead.mining.iplom import iplom_templates, parse_iplom
from sparklead.mining.pl_iplom import parse_pl_iplom, pl_iplom_templates
from sparklead.mining.ael import parse_ael
from sparklead.mining.brain import parse_brain
from sparklead.mining.two_phase import TwoPhaseMiner, parse_lenma, parse_spell

__all__ = [
    "DrainMiner",
    "TwoPhaseMiner",
    "iplom_templates",
    "parse_ael",
    "parse_brain",
    "parse_drain",
    "parse_iplom",
    "parse_lenma",
    "parse_pl_iplom",
    "parse_spell",
    "pl_iplom_templates",
]
