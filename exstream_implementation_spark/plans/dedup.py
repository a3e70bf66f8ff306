"""(populated later this round)"""
