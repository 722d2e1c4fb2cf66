from .paged_api import PagedApiDataSource  # noqa: F401
