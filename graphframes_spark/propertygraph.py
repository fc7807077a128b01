"""Property-graph layer: heterogeneous vertex/edge groups → GraphFrame.

Semantics follow the reference
(/root/reference/core/src/main/scala/org/graphframes/propertygraph/PropertyGraphFrame.scala:33-205,
property/VertexPropertyGroup.scala:46-109, property/EdgePropertyGroup.scala:52-158;
Python mirror python/graphframes/pg/property_graphframe.py):

- **VertexPropertyGroup / EdgePropertyGroup**: named DataFrames plus the
  metadata to interpret them (primary key / src / dst / weight columns,
  directedness). IDs are masked as ``group_name || sha2(id, 256)`` so
  groups cannot collide when unified (``apply_mask_on_id=False`` opts
  out for pre-disjoint keys).
- **to_graph_frame**: unify selected groups into one homogeneous
  GraphFrame (vertices: id + property_group; edges: src/dst/weight,
  undirected groups symmetrized), with per-group filter pushdown.
- **projection_by**: bipartite projection — connect left-part vertices
  sharing a right-part neighbor; custom weight combiner.
- **join_vertices**: map algorithm output back to per-group external IDs.

Scale notes: everything is select/union/filter/join — no shuffles beyond
what the user's algorithm needs; per-group filters are applied *before*
the union so Catalyst pushes them into each group's scan. The bipartite
projection self-joins on the shared neighbor — hub neighbors produce
quadratic fan-out (same as the reference); cap right-part degrees
upstream when projecting social-scale data.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphframes_spark.graphframe import GraphFrame
from graphframes_spark.util import DST, ID, SRC, WEIGHT, GraphFramesError

PROPERTY_GROUP_COL_NAME = "property_group"
EXTERNAL_ID = "external_id"


class InvalidPropertyGroupError(GraphFramesError):
    """Raised when a property group references missing/invalid columns."""


#: reference python client name (pg/property_groups.py
#: InvalidPropertyGroupException)
InvalidPropertyGroupException = InvalidPropertyGroupError


@dataclass(frozen=True)
class VertexPropertyGroup:
    """Named group of vertices (VertexPropertyGroup.scala:46-109)."""

    name: str
    data: DataFrame
    primary_key_column: str = ID
    apply_mask_on_id: bool = True

    def __post_init__(self) -> None:
        if self.primary_key_column not in self.data.columns:
            raise InvalidPropertyGroupError(
                f"source column {self.primary_key_column} does not exist, "
                f"existed columns [{', '.join(self.data.columns)}]"
            )

    def _masked_id(self) -> Column:
        key = F.col(self.primary_key_column)
        if self.apply_mask_on_id:
            return F.concat(F.lit(self.name), F.sha2(key.cast("string"), 256))
        return key.cast("string")

    @property
    def internal_id_mapping(self) -> DataFrame:
        """DF[external_id, id] for back-mapping algorithm output."""
        return self.data.select(
            F.col(self.primary_key_column).alias(EXTERNAL_ID)
        ).withColumn(
            ID,
            F.concat(F.lit(self.name), F.sha2(F.col(EXTERNAL_ID).cast("string"), 256))
            if self.apply_mask_on_id
            else F.col(EXTERNAL_ID).cast("string"),
        )

    def get_data(self, filter: Optional[Column] = None) -> DataFrame:
        d = self.data if filter is None else self.data.filter(filter)
        return d.select(
            self._masked_id().alias(ID),
            F.lit(self.name).alias(PROPERTY_GROUP_COL_NAME),
        )


@dataclass(frozen=True)
class EdgePropertyGroup:
    """Named group of edges (EdgePropertyGroup.scala:52-158)."""

    name: str
    data: DataFrame
    src_property_group: VertexPropertyGroup
    dst_property_group: VertexPropertyGroup
    is_directed: bool = True
    src_column_name: str = SRC
    dst_column_name: str = DST
    weight_column_name: str = WEIGHT

    def __post_init__(self) -> None:
        from pyspark.sql import types as T

        for col_name, what in (
            (self.src_column_name, "source"),
            (self.dst_column_name, "dest"),
            (self.weight_column_name, "weight"),
        ):
            if col_name not in self.data.columns:
                raise InvalidPropertyGroupError(
                    f"{what} column {col_name} does not exist, existed columns "
                    f"[{', '.join(self.data.columns)}]"
                )
        wt = self.data.schema[self.weight_column_name].dataType
        if not isinstance(wt, T.NumericType):
            raise InvalidPropertyGroupError(
                f"weight column {self.weight_column_name} must be numeric type, "
                f"but was {wt}"
            )

    def _masked_endpoint(self, col_name: str, group: VertexPropertyGroup) -> Column:
        if group.apply_mask_on_id:
            return F.concat(
                F.lit(group.name), F.sha2(F.col(col_name).cast("string"), 256)
            )
        return F.col(col_name).cast("string")

    def get_data(self, filter: Optional[Column] = None) -> DataFrame:
        d = self.data if filter is None else self.data.filter(filter)
        base = d.select(
            self._masked_endpoint(self.src_column_name, self.src_property_group).alias(SRC),
            self._masked_endpoint(self.dst_column_name, self.dst_property_group).alias(DST),
            F.col(self.weight_column_name).alias(WEIGHT),
        )
        if self.is_directed:
            return base
        return base.union(
            base.select(
                F.col(DST).alias(SRC), F.col(SRC).alias(DST), F.col(WEIGHT)
            )
        )


@dataclass(frozen=True)
class PropertyGraphFrame:
    """Heterogeneous property graph (PropertyGraphFrame.scala:33-205)."""

    vertex_property_groups: Sequence[VertexPropertyGroup]
    edge_property_groups: Sequence[EdgePropertyGroup]

    def _vgroup(self, name: str) -> VertexPropertyGroup:
        for g in self.vertex_property_groups:
            if g.name == name:
                return g
        raise GraphFramesError(f"Vertex property group {name} does not exist")

    def _egroup(self, name: str) -> EdgePropertyGroup:
        for g in self.edge_property_groups:
            if g.name == name:
                return g
        raise GraphFramesError(f"Edge property group {name} does not exist")

    def to_graph_frame(
        self,
        vertex_property_groups: Sequence[str],
        edge_property_groups: Sequence[str],
        edge_group_filters: Optional[Dict[str, Column]] = None,
        vertex_group_filters: Optional[Dict[str, Column]] = None,
    ) -> GraphFrame:
        """Unify selected groups into one GraphFrame; filters are applied
        per group before the union (pushed to each group's scan)."""
        vfilters = vertex_group_filters or {}
        efilters = edge_group_filters or {}
        v_parts = [
            self._vgroup(n).get_data(vfilters.get(n)) for n in vertex_property_groups
        ]
        e_parts = [
            self._egroup(n).get_data(efilters.get(n)) for n in edge_property_groups
        ]
        vertices = v_parts[0]
        for p in v_parts[1:]:
            vertices = vertices.union(p)
        edges = e_parts[0]
        for p in e_parts[1:]:
            edges = edges.union(p)
        return GraphFrame(vertices, edges)

    toGraphFrame = to_graph_frame

    def projection_by(
        self,
        left_bigraph_part: str,
        right_bigraph_part: str,
        edge_group: str,
        new_edge_weight: Optional[Callable[[Column, Column], Column]] = None,
    ) -> "PropertyGraphFrame":
        """Bipartite projection onto the left part: connect left vertices
        sharing a right-side neighbor; the through-group and its vertex
        group are dropped (PropertyGraphFrame.scala:109-152)."""
        eg = self._egroup(edge_group)
        if eg.src_property_group.name != left_bigraph_part:
            raise GraphFramesError(
                f"Edge Property Group should have {left_bigraph_part} source "
                f"group but has {eg.src_property_group.name}"
            )
        if eg.dst_property_group.name != right_bigraph_part:
            raise GraphFramesError(
                f"Edge Property Group should have {right_bigraph_part} destination "
                f"group but has {eg.dst_property_group.name}"
            )
        kept_v = [g for g in self.vertex_property_groups if g.name != right_bigraph_part]
        kept_e = [g for g in self.edge_property_groups if g.name != edge_group]
        d = eg.data
        e1 = d.alias("e1")
        e2 = d.alias("e2")
        sc, dc, wc = eg.src_column_name, eg.dst_column_name, eg.weight_column_name
        weight = (
            new_edge_weight(F.col(f"e1.{wc}"), F.col(f"e2.{wc}"))
            if new_edge_weight is not None
            else F.lit(1.0)
        )
        projected = (
            e1.join(e2, F.col(f"e1.{dc}") == F.col(f"e2.{dc}"))
            .where(F.col(f"e1.{sc}") < F.col(f"e2.{sc}"))
            .select(
                F.col(f"e1.{sc}").alias(SRC),
                F.col(f"e2.{sc}").alias(DST),
                weight.alias(WEIGHT),
            )
        )
        left_group = self._vgroup(left_bigraph_part)
        new_group = EdgePropertyGroup(
            name=f"projected_{edge_group}",
            data=projected,
            src_property_group=left_group,
            dst_property_group=left_group,
            is_directed=False,
            src_column_name=SRC,
            dst_column_name=DST,
            weight_column_name=WEIGHT,
        )
        return PropertyGraphFrame(kept_v, list(kept_e) + [new_group])

    projectionBy = projection_by

    def join_vertices(
        self, vertices_data: DataFrame, vertex_groups: Sequence[str]
    ) -> DataFrame:
        """Map algorithm output (with masked ids + property_group) back to
        per-group external IDs (PropertyGraphFrame.scala:169-189)."""
        parts = []
        for name in vertex_groups:
            group = self._vgroup(name)
            filtered = vertices_data.filter(
                F.col(PROPERTY_GROUP_COL_NAME) == F.lit(name)
            )
            if group.apply_mask_on_id:
                parts.append(
                    group.internal_id_mapping.join(filtered, [ID], "left").drop(ID)
                )
            else:
                parts.append(
                    group.get_data()
                    .select(ID)
                    .join(filtered, ID, "left")
                    .withColumnRenamed(ID, EXTERNAL_ID)
                )
        out = parts[0]
        for p in parts[1:]:
            out = out.union(p)
        return out

    joinVertices = join_vertices

    # reference python client names (pg/property_graphframe.py:80-330)
    to_graphframe = to_graph_frame

    @property
    def edges_property_groups(self) -> Sequence[EdgePropertyGroup]:
        return self.edge_property_groups
