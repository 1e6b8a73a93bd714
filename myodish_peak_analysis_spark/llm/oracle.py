ORACLES: dict = {}
