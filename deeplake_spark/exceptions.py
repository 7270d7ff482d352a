"""Reference exception taxonomy.

The reference exposes a flat family of typed exceptions at package level
(`python/deeplake/__init__.pyi:3792-3990`) — user code catches
`deeplake.ColumnDoesNotExistError`, `deeplake.BranchNotFoundError`, etc.
Here every dataset-facing error subclasses :class:`DatasetError` (our
historical base, kept as the catch-all), so both styles work:

    except deeplake_spark.DatasetError:            # engine catch-all
    except deeplake_spark.BranchNotFoundError:     # reference-style

A few classes dual-inherit a stdlib type (``ValueError`` /
``NotImplementedError``) because those are the types this engine raised
before the taxonomy existed and callers may already pin them.

Hosted-service errors (AgreementError, AuthenticationError, HTTP*,
TelemetryClient-related) are intentionally absent: there is no hosted
control plane in this engine (see storage.py — the metadata facade is
POSIX / mem:// / Hadoop FS).
"""

from __future__ import annotations


class DatasetError(RuntimeError):
    """Base for all dataset-facing errors (catch-all)."""


class MergeConflictError(DatasetError):
    """A shared row (or column type) was modified on both branches since
    the merge base; pass resolve='ours'/'theirs' to pick a side."""


# ------------------------------------------------------------ columns

class ColumnAlreadyExistsError(DatasetError):
    """add_column with a name already in the schema (__init__.pyi:3804)."""


class ColumnDoesNotExistError(DatasetError, KeyError):
    """Column name not in the schema (__init__.pyi:3807)."""


class EmptyColumnNameError(DatasetError, ValueError):
    """'' is not a column name (__init__.pyi:3831)."""


class InvalidColumnValueError(DatasetError, ValueError):
    """Value incompatible with the column type (__init__.pyi:3810)."""


class ColumnMissingAppendValueError(DatasetError):
    """append() row lacks a value for a schema column (__init__.pyi:3801)."""


class UnevenColumnsError(DatasetError):
    """append() columns have differing lengths (__init__.pyi:3795)."""


class UnevenUpdateError(DatasetError):
    """Batch update spans differing row counts (__init__.pyi:3798)."""


# ------------------------------------------------------ branches / tags

class BranchExistsError(DatasetError):
    """branch() name already taken (__init__.pyi:3882)."""


class BranchNotFoundError(DatasetError):
    """No such branch (__init__.pyi:3885)."""


class CannotDeleteMainBranchError(DatasetError):
    """main (or the current branch) refuses deletion (__init__.pyi)."""


class CannotRenameMainBranchError(DatasetError):
    """main refuses renaming (__init__.pyi)."""


class TagExistsError(DatasetError):
    """tag() name already taken (__init__.pyi:3891)."""


class TagNotFoundError(DatasetError):
    """No such tag (__init__.pyi:3888)."""


class VersionNotFoundError(DatasetError):
    """checkout/open of an unknown version id (__init__.pyi)."""


# ------------------------------------------------------------- indexes

class IndexAlreadyExistsError(DatasetError):
    """create_index on an already-indexed column (__init__.pyi:3825)."""


class InvalidIndexCreationError(DatasetError, ValueError):
    """Unsupported index kind / missing required options
    (__init__.pyi:3819)."""


# ------------------------------------------------------------ open/write

class ReadOnlyDatasetModificationError(DatasetError):
    """Write API called on a read-only handle (__init__.pyi:3870)."""


class NotFoundError(DatasetError):
    """No dataset at the given path (__init__.pyi:3921)."""


class DatasetUnavailableError(NotFoundError):
    """Dataset cannot be reached (__init__.pyi:3873); for this engine a
    subclass of NotFoundError — there is no network control plane whose
    transient failures would distinguish the two."""


class DatasetExistsError(DatasetError):
    """create() over an existing dataset (reference raises a runtime
    error with the same message shape; named here for symmetry)."""


class WriteFailedError(DatasetError):
    """A data/metadata write did not land (__init__.pyi)."""


class PushError(DatasetError):
    """push/pull replication failure (__init__.pyi:3897)."""


class LogExistsError(DatasetError):
    """Operation log already enabled (__init__.pyi:3903)."""


class LogNotexistsError(DatasetError):
    """replay_log/operation_log with no log present (__init__.pyi:3906).
    (Name kept verbatim from the reference, typo included.)"""


class IncorrectDeeplakePathError(DatasetError, ValueError):
    """Malformed dataset path/URI (__init__.pyi:3909)."""


class InvalidURIError(DatasetError, ValueError):
    """URI scheme not resolvable to a storage backend (__init__.pyi)."""


class StorageProviderMissingError(DatasetError):
    """No registered store for the path's scheme (__init__.pyi)."""


class StorageKeyNotFound(DatasetError, KeyError):
    """Metadata-store read of a missing key (__init__.pyi)."""


class StorageKeyAlreadyExists(DatasetError):
    """Metadata-store create over an existing key (__init__.pyi)."""


# --------------------------------------------------------------- types

class UnknownType(DatasetError, ValueError):
    """Unrecognized dtype/htype name (__init__.pyi:3957)."""


class InvalidType(DatasetError, ValueError):
    """Type invalid in this position (__init__.pyi:3900)."""


class UnknownStringType(DatasetError, ValueError):
    """Unparseable type string (__init__.pyi:3942)."""


class UnspecifiedDtype(DatasetError, ValueError):
    """Type requires an explicit dtype (__init__.pyi)."""


class InvalidTypeDimensions(DatasetError, ValueError):
    """Dimension spec incompatible with the type (__init__.pyi)."""


class InvalidTypeAndFormatPair(DatasetError, ValueError):
    """Type/format combination not allowed (__init__.pyi:3951)."""


# ---------------------------------------------------- formats / codecs

class FormatNotSupportedError(DatasetError, NotImplementedError):
    """Codec/format has no decoder in this environment
    (__init__.pyi:3792). Subclasses NotImplementedError because strict-
    mode decode raised that before the taxonomy existed."""


class UnknownFormat(DatasetError, ValueError):
    """Unrecognized datafile format object (__init__.pyi:3939)."""


class UnsupportedSampleCompression(DatasetError, ValueError):
    """sample_compression codec not supported (__init__.pyi)."""


class UnsupportedChunkCompression(DatasetError, ValueError):
    """chunk_compression codec not supported (__init__.pyi)."""


class InvalidChunkStrategyType(DatasetError, ValueError):
    """Bad chunk strategy object (__init__.pyi:3945)."""


__all__ = [n for n in dir() if n.endswith(("Error", "Exists", "NotFound"))
           or n in ("UnknownType", "InvalidType", "UnknownStringType",
                    "UnspecifiedDtype", "InvalidTypeDimensions",
                    "InvalidTypeAndFormatPair", "UnknownFormat",
                    "UnsupportedSampleCompression",
                    "UnsupportedChunkCompression",
                    "InvalidChunkStrategyType")]
