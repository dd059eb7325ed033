"""(placeholder — populated in later stages)"""
