class SQLAlchemyError(Exception):
    pass


class IntegrityError(SQLAlchemyError):
    pass


class OperationalError(SQLAlchemyError):
    pass
