"""Landmark localisation/detection metric suite -> df_eval.csv."""
