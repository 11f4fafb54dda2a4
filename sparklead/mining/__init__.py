from sparklead.mining.drain import DrainMiner, parse_drain

__all__ = ["DrainMiner", "parse_drain"]
