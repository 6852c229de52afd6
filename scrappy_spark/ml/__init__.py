"""ML operators (SURVEY.md §2.7): term classification (MLlib pipeline),
rule contextualization, embedding inference (pandas UDF), and the
clustering taxonomy with c-TF-IDF topic keywords.
"""
