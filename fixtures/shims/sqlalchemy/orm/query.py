class Query:
    pass
